#!/usr/bin/env python
"""Host->device transfer probe (evidence for PERF.md "Data loading" +
the train-loop transfer-overlap question, VERDICT r3 next #3).

Measures, on the live backend:

1. ``jax.device_put`` bandwidth (fresh buffers each rep — this VM
   first-touches anonymous memory at ~35 MB/s, so buffers are written
   once and REUSED with in-place mutation to keep page faults out of
   the timing);
2. execute-argument bandwidth (numpy fed straight to a jitted fn);
3. whether a ``device_put`` issued WHILE a long compiled program runs
   completes in idle-time (true H2D/compute overlap) or serializes
   behind the program — the decisive fact for prefetch design: if the
   tunnel serializes puts with execution, no amount of host-side
   threading makes with-transfers time approach the pure-step time,
   and the honest bound is ``step + put``.

Usage: python tools/probe_transfer.py [--mb 32] [--reps 5]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mb', type=int, default=32)
    ap.add_argument('--reps', type=int, default=5)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f'# backend={jax.default_backend()} device={dev}')
    n = a.mb * 1024 * 1024 // 4

    # one warm buffer, mutated per rep (vary content, not pages)
    buf = np.random.RandomState(0).rand(n).astype(np.float32)

    # --- 1. device_put bandwidth ---
    ts = []
    for i in range(a.reps):
        buf[i] = i  # vary
        t0 = time.perf_counter()
        x = jax.device_put(buf)
        _ = np.asarray(x[:1])  # commit
        ts.append(time.perf_counter() - t0)
    put_t = np.median(ts)
    print(f'device_put {a.mb} MB: median {put_t*1e3:.0f} ms '
          f'({a.mb/put_t:.0f} MB/s), all={[f"{t:.3f}" for t in ts]}')

    # --- 2. execute-argument bandwidth ---
    @jax.jit
    def consume(v):
        return v.sum()

    _ = np.asarray(consume(buf))  # compile
    ts = []
    for i in range(a.reps):
        buf[i] = 100 + i
        t0 = time.perf_counter()
        _ = np.asarray(consume(buf))
        ts.append(time.perf_counter() - t0)
    arg_t = np.median(ts)
    print(f'execute-arg {a.mb} MB: median {arg_t*1e3:.0f} ms '
          f'({a.mb/arg_t:.0f} MB/s)')

    # --- 3. overlap probe ---
    # a compiled program long enough to dwarf one put (~1-2 s): chained
    # matmuls via fori_loop
    m = jnp.asarray(np.random.RandomState(1).rand(4096, 4096)
                    .astype(np.float32))

    def heavy(x, iters):
        return jax.lax.fori_loop(
            0, iters, lambda i, v: 0.999 * (v @ m) / 4096.0, x)

    heavy_j = jax.jit(heavy, static_argnums=1)
    # calibrate iters so the program RUNS (compile excluded) >= 4x the
    # put time; vary the input each timing call — identical executions
    # can be elided by this backend
    rs2 = np.random.RandomState(2)
    iters = 256
    while True:
        x = jnp.asarray(rs2.rand(4096, 4096).astype(np.float32))
        _ = np.asarray(heavy_j(x, iters)[:1, :1])   # compile + warm
        x = jnp.asarray(rs2.rand(4096, 4096).astype(np.float32))
        t0 = time.perf_counter()
        _ = np.asarray(heavy_j(x, iters)[:1, :1])
        ht = time.perf_counter() - t0
        if ht >= max(4 * put_t, 0.8) or iters >= 65536:
            break
        iters *= 4
    print(f'heavy program: {ht:.2f} s per run at {iters} iters '
          '(compile excluded)')

    # end-to-end differential: a chain of N heavy programs, (a) bare,
    # (b) one main-thread put between dispatches, (c) puts issued from
    # a background thread while the chain runs.  If puts overlap
    # compute, (b)/(c) ≈ (a); if the backend serializes them,
    # (b)/(c) ≈ (a) + N*put.  Robust to async-dispatch quirks: only
    # wall time of the fully-drained chain is compared.
    N = 4

    def chain(puts: str):
        import threading
        outs = []
        datas = []
        stop = threading.Event()

        def bg():
            j = 0
            while not stop.is_set() and j < 2 * N:  # bound HBM use
                buf[j % 64] = 300 + j
                datas.append(jax.device_put(buf))
                j += 1

        # fresh start value per variant — identical chains can be
        # elided by the backend
        x0 = jnp.asarray(rs2.rand(4096, 4096).astype(np.float32))
        t0 = time.perf_counter()
        th = None
        if puts == 'thread':
            th = threading.Thread(target=bg, daemon=True)
            th.start()
        xx = x0
        for i in range(N):
            xx = heavy_j(xx, iters)
            outs.append(xx)
            if puts == 'inline':
                buf[i] = 400 + i
                datas.append(jax.device_put(buf))
        _ = np.asarray(outs[-1][:1, :1])  # drain the chain
        dt = time.perf_counter() - t0
        if th is not None:
            stop.set()
            th.join(timeout=5)
        return dt, len(datas)

    bare, _ = chain('none')
    inline, n_in = chain('inline')
    threaded, n_th = chain('thread')
    print(f'chain of {N} heavy programs: bare {bare:.2f} s | '
          f'+{n_in} inline puts {inline:.2f} s | '
          f'+{n_th} threaded puts {threaded:.2f} s '
          f'(idle put {put_t*1e3:.0f} ms)')
    inline_over = (inline - bare) / max(n_in, 1)
    print(f'inline put marginal cost while busy: '
          f'{inline_over*1e3:.0f} ms vs idle {put_t*1e3:.0f} ms')
    if inline_over < 0.5 * put_t:
        print('VERDICT: puts OVERLAP device compute on this backend '
              '— prefetch hides transfers behind the step')
    else:
        print('VERDICT: puts SERIALIZE with device compute on this '
              f'backend (marginal {inline_over*1e3:.0f} ms/put) — '
              'with-transfers time is bounded below by step + put '
              'here; true overlap needs a directly-attached TPU host')


if __name__ == '__main__':
    main()
