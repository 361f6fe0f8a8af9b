#!/usr/bin/env python
"""Does the tunnel's host->device bandwidth degrade with process age?
(VERDICT r4 'what's weak' #2 — the other half of the data-creep
bisection; host half: tools/probe_loader_creep.py.)

Mimics the train loop's serial put-then-dispatch cadence for many
minutes from ONE long-lived process: each iter mutates + device_puts a
train-shaped ~21 MB batch and dispatches a moderate jitted program,
timing the put.  Every ``--eval-every`` iters it performs an eval-like
burst (large device->host readbacks + a checkpoint-sized host write)
— the operation that, in the r4 convergence run, coincided with the
``data:`` time RESETTING to ~0.3 s.  If put bandwidth decays with age
and recovers after the burst, the creep is a tunnel/client phenomenon,
not the loader.

Usage: python tools/probe_transfer_age.py --iters 600 --eval-every 150
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=600)
    ap.add_argument('--eval-every', type=int, default=150)
    ap.add_argument('--log-every', type=int, default=25)
    ap.add_argument('--step-ms', type=float, default=0.0,
                    help='optional host sleep between iters')
    ap.add_argument('--fresh-every', type=int, default=0,
                    help='every N iters, PAUSE and measure the same '
                         'put from a FRESH subprocess — same link '
                         'minute, zero process age. Aged slow + '
                         'fresh fast = process aging; both slow = '
                         'link weather.')
    ap.add_argument('--work-matmuls', type=int, default=300,
                    help='2048^2 matmuls per step program (~0.1s/150 '
                         'on v5e f32)')
    ap.add_argument('--cadence', choices=['serial', 'train'],
                    default='serial',
                    help="serial: put -> dispatch -> full sync per "
                         "iter. train: the REAL loop's shape — "
                         "dispatch the step async, then device_put "
                         "the next batch WHILE the program runs, "
                         "syncing only on a lagged scalar (the "
                         "contended-put regime the train loop "
                         "actually lives in)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f'# backend={jax.default_backend()} '
          f'device={jax.devices()[0]}', flush=True)

    # train-shaped batch: img/target/strong 2x512x512x3 f32 + labels
    rs = np.random.RandomState(0)
    batch = {
        'img': rs.rand(2, 512, 512, 3).astype(np.float32),
        'target_img': rs.rand(2, 512, 512, 3).astype(np.float32),
        'target_img_strong_aug': rs.rand(2, 512, 512, 3).astype(
            np.float32),
        'gt_semantic_seg': rs.randint(0, 6, (2, 512, 512)).astype(
            np.int32),
    }
    nbytes = sum(v.nbytes for v in batch.values())

    w = jnp.asarray(rs.randn(2048, 2048) * 0.01, jnp.float32)

    @jax.jit
    def work(b, i):
        # a program long enough (~0.1-0.3 s, --work-matmuls) that a
        # train-cadence put genuinely overlaps a running program
        x = jnp.reshape(b['img'], (-1, 2048))[:2048] + 0.001 * i

        def body(_, v):
            return jnp.tanh(v @ w) + v

        x = jax.lax.fori_loop(0, a.work_matmuls, body, x)
        return x.sum()

    # warm: compile + first puts
    db = jax.device_put(batch)
    _ = np.asarray(work(db, 0))

    put_t = []
    t0_all = time.time()
    pending = []
    for it in range(a.iters):
        batch['img'][0, 0, 0, 0] = it  # vary content, reuse pages
        if a.cadence == 'train':
            # dispatch async on the CURRENT device batch, then time
            # the put of the NEXT batch while the program runs — the
            # train loop's exact shape (apis/train.py: step_fn
            # dispatch, then prefetcher.next() -> main-thread put)
            out = work(db, it)
            pending.append(out)
            t0 = time.perf_counter()
            db = jax.device_put(batch)
            jax.block_until_ready(db)
            put_t.append(time.perf_counter() - t0)
            if len(pending) > 2:  # lagged sync like the async queue
                _ = np.asarray(pending.pop(0))
        else:
            t0 = time.perf_counter()
            db = jax.device_put(batch)
            out = work(db, it)
            _ = np.asarray(out)  # force completion (block unreliable)
            put_t.append(time.perf_counter() - t0)
        if a.step_ms:
            time.sleep(a.step_ms / 1e3)

        if (it + 1) % a.log_every == 0:
            seg = put_t[-a.log_every:]
            # 'train' cadence times the put alone (block on db), so
            # bytes/median IS bandwidth; 'serial' includes the step
            # program + readback — report it as an upper-bound label
            bw = nbytes / np.median(seg) / 1e6
            what = 'put' if a.cadence == 'train' else 'put+step'
            qual = '' if a.cadence == 'train' else ' (incl. step; BW lower bound)'
            print(f'iter {it + 1:5d}: {what} median '
                  f'{np.median(seg):.3f}s p90 '
                  f'{np.percentile(seg, 90):.3f}s '
                  f'~{bw:.0f} MB/s{qual}, '
                  f'age {time.time() - t0_all:.0f}s',
                  flush=True)

        if a.fresh_every and (it + 1) % a.fresh_every == 0:
            import subprocess
            import sys
            code = (
                'import time, numpy as np, jax\n'
                'rs = np.random.RandomState(0)\n'
                'b = {k: rs.rand(2, 512, 512, 3).astype(np.float32)\n'
                '     for k in ("img", "target_img", '
                '"target_img_strong_aug")}\n'
                'b["gt_semantic_seg"] = rs.randint('
                '0, 6, (2, 512, 512)).astype(np.int32)\n'
                'ts = []\n'
                'for i in range(4):\n'
                '    b["img"][0,0,0,0] = i\n'
                '    t0 = time.perf_counter()\n'
                '    jax.block_until_ready(jax.device_put(b))\n'
                '    ts.append(time.perf_counter() - t0)\n'
                'mb = sum(v.nbytes for v in b.values()) / 1e6\n'
                'print("FRESH med %.3fs ~%.0f MB/s (all %s)" % ('
                'sorted(ts)[1], mb / sorted(ts)[1], '
                '["%.2f" % t for t in ts]))\n')
            t0 = time.perf_counter()
            r = subprocess.run([sys.executable, '-c', code],
                               capture_output=True, text=True,
                               timeout=600)
            print(f'iter {it + 1:5d}: fresh-process control: '
                  f'{(r.stdout or r.stderr).strip().splitlines()[-1]}'
                  f' (spawn+init {time.perf_counter() - t0:.0f}s)',
                  flush=True)

        if a.eval_every and (it + 1) % a.eval_every == 0:
            t0 = time.perf_counter()
            big = jnp.zeros((8, 512, 512, 6), jnp.float32) + it
            for _ in range(6):            # eval-like readbacks
                _ = np.asarray(big)
            blob = np.zeros((64, 1 << 20), np.uint8)
            blob.tofile('/tmp/probe_age_ckpt.bin')
            import os
            os.remove('/tmp/probe_age_ckpt.bin')
            print(f'iter {it + 1:5d}: eval-like burst '
                  f'({time.perf_counter() - t0:.1f}s)', flush=True)

    n = len(put_t)
    qual = '' if a.cadence == 'train' else \
        '; serial cadence includes the step program, so MB/s is a ' \
        'LOWER bound'
    print(f'\nsegment medians ({nbytes / 1e6:.0f} MB/batch{qual}):')
    for s in range(0, n, 100):
        seg = put_t[s:s + 100]
        print(f'  iters {s + 1:4d}-{s + len(seg):4d}: median '
              f'{np.median(seg):.3f}s '
              f'(~{nbytes / np.median(seg) / 1e6:.0f} MB/s)')


if __name__ == '__main__':
    main()
