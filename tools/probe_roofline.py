#!/usr/bin/env python
"""Roofline decomposition of the PFGST batch-2 train step (VERDICT r3
next #5: replace the prose per-op-overhead claim with arithmetic from
an actual measurement of THIS compiled step).

For each of the four split programs (ema / teacher / mix / opt) this
probe reports, from the COMPILED executable:

  * fusions   — dispatchable HLO ops in the entry computation
                (fusion/conv/custom-call/collective roots); on this
                backend each costs a fixed dispatch overhead
  * gflop     — compiler cost analysis FLOPs
  * gbytes    — compiler cost analysis bytes accessed (HBM traffic)
  * measured  — sustained s/iter of the program alone (device-resident
                inputs, chained, one materialization)
  * model     — ops*per_op + max(flops/peak, bytes/bw): the roofline
                prediction using THIS box's measured per-op cost, peak
                matmul rate and HBM bandwidth (probed inline)

If measured ≈ model and the ops*per_op term dominates, the observed
train MFU is a per-op-overhead ceiling, not a missed optimization.

Usage: python tools/probe_roofline.py [--batch 2] [--steps 8]
                                      [--dtype bf16]
"""
import argparse
import json
import os.path as osp
import re
import sys
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def count_dispatch_ops(compiled):
    """(entry_ops, conv_ops): ops in the ENTRY computation of the
    optimized HLO (what the TPU executor actually sequences), and how
    many of them are convolution/dot roots."""
    try:
        txt = compiled.as_text()
    except Exception:
        return -1, -1
    m = re.search(r'^ENTRY [^{]+\{(.*?)^\}', txt,
                  re.MULTILINE | re.DOTALL)
    if not m:
        return -1, -1
    body = m.group(1)
    skip = ('parameter(', 'constant(', 'get-tuple-element(',
            ' tuple(', 'bitcast(')
    n = conv = 0
    for line in body.splitlines():
        if ' = ' not in line:
            continue
        if any(s in line for s in skip):
            continue
        n += 1
        if 'convolution(' in line or ' dot(' in line or \
                'custom-call' in line and 'Conv' in line:
            conv += 1
    return n, conv


def cost(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return (float(c.get('flops', float('nan'))),
                float(c.get('bytes accessed', float('nan'))))
    except Exception:
        return float('nan'), float('nan')


def probe_machine(jnp, jax):
    """Measured per-op dispatch cost, peak matmul, HBM bandwidth."""
    from jax import lax
    rs = np.random.RandomState(0)

    def timed(fn, args, n, reps=3):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = (time.perf_counter() - t0) / n
            best = dt if best is None else min(best, dt)
        return best

    # per-op floors: unrolled chains of dependent tiny ops (each its
    # own dispatch, negligible FLOPs/bytes).  Convs carry a much
    # higher fixed cost than fused elementwise ops on this backend,
    # so both floors are probed.
    xc = jnp.asarray(rs.randn(1, 8, 8, 8), jnp.bfloat16)
    wc = jnp.asarray(rs.randn(1, 1, 8, 8) * 0.1, jnp.bfloat16)
    DN = ('NHWC', 'HWIO', 'NHWC')

    @jax.jit
    def chain64(x, w):
        for _ in range(64):
            x = lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                         dimension_numbers=DN)
        return x.astype(jnp.float32).sum()

    per_conv = timed(chain64, (xc, wc), 64)

    xe = jnp.asarray(rs.randn(8, 128), jnp.float32)

    @jax.jit
    def chain_ew(x):
        for i in range(64):
            x = jnp.tanh(x * jnp.float32(1.0 + 1e-6 * i))
            # keep the 64 steps as 64 separate dispatches — without
            # the barrier XLA fuses the whole chain into one op
            x = lax.optimization_barrier(x)
        return x.sum()

    per_ew = timed(chain_ew, (xe,), 64)

    # peak matmul (bf16)
    a = jnp.asarray(rs.randn(4096, 4096) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rs.randn(4096, 4096) * 0.02, jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        def body(c, _):
            return (c @ b) * jnp.bfloat16(0.02), ()
        y, _ = lax.scan(body, a, None, length=20)
        return y.astype(jnp.float32).mean()

    peak = 2.0 * 4096 ** 3 * 20 / timed(mm, (a, b), 1)

    # HBM bandwidth: big elementwise copy-scale
    v = jnp.asarray(rs.randn(64 * 1024 * 1024 // 4), jnp.float32)

    @jax.jit
    def ew(v):
        def body(c, _):
            return c * jnp.float32(1.0000001), ()
        y, _ = lax.scan(body, v, None, length=10)
        return y[0]

    # 10 iterations, each reads+writes 64 MB
    bw = 2 * 64 * 1024 * 1024 * 10 / timed(ew, (v,), 1)
    return per_conv, per_ew, peak, bw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--steps', type=int, default=8)
    ap.add_argument('--dtype', default='bf16')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench_train as bt

    per_conv, per_ew, peak, bw = probe_machine(jnp, jax)
    print(json.dumps({'probe': 'machine',
                      'per_conv_op_us': round(per_conv * 1e6, 1),
                      'per_elementwise_op_us': round(per_ew * 1e6, 1),
                      'peak_tflops': round(peak / 1e12, 1),
                      'stream_gbps': round(bw / 1e9, 1)}))

    algo, state, step = bt.build(args.batch, args.size, args.dtype)
    progs = step.programs
    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(42)
    b = bt.make_batch(rs, args.batch, args.size)
    state, lv, _ = step(state, b, rng)   # compile all four
    _ = np.asarray(lv['loss'])

    # compiled objects for analysis
    dev_b = jax.device_put(b)
    lowered = {}
    lowered['ema'] = progs['ema'].lower(state).compile()
    t_args = (state.ema_params, state.ema_batch_stats,
              dev_b['target_img'])
    lowered['teacher'] = progs['teacher'].lower(*t_args).compile()
    teacher_out = jax.eval_shape(lambda *a: progs['teacher'](*a),
                                 *t_args)
    lowered['mix'] = progs['mix'].lower(dev_b, rng,
                                        teacher_out).compile()
    premix = jax.eval_shape(lambda bb, r, t: progs['mix'](bb, r, t),
                            dev_b, rng, teacher_out)
    lowered['opt'] = progs['opt'].lower(state, dev_b, rng,
                                        premix).compile()

    # measured per-program times (device-resident, chained)
    meas = {}
    imgs = bt.put_batches(
        [rs.randn(args.batch, args.size, args.size, 3)
         .astype(np.float32) for _ in range(args.steps)])
    batches = bt.put_batches(
        [bt.make_batch(rs, args.batch, args.size)
         for _ in range(args.steps)])

    t0 = time.perf_counter()
    s = state
    for _ in range(args.steps):
        s = progs['ema'](s)
    _ = np.asarray(jax.tree_util.tree_leaves(s.ema_params)[0]
                   .ravel()[:1])
    meas['ema'] = (time.perf_counter() - t0) / args.steps
    state = s

    t0 = time.perf_counter()
    touts = [progs['teacher'](state.ema_params, state.ema_batch_stats,
                              im) for im in imgs]
    _ = np.asarray(touts[-1][0].ravel()[:1])
    meas['teacher'] = (time.perf_counter() - t0) / args.steps

    t0 = time.perf_counter()
    premixes = [progs['mix'](bb, jax.random.fold_in(rng, i), touts[i])
                for i, bb in enumerate(batches)]
    _ = np.asarray(premixes[-1]['mixed_img'].ravel()[:1])
    meas['mix'] = (time.perf_counter() - t0) / args.steps

    t0 = time.perf_counter()
    lv = None
    for i, bb in enumerate(batches):
        state, lv, _ = progs['opt'](state, bb,
                                    jax.random.fold_in(rng, 100 + i),
                                    premixes[i])
    _ = np.asarray(lv['loss'])
    _ = np.asarray(jax.tree_util.tree_leaves(state.params)[0]
                   .ravel()[:1])
    meas['opt'] = (time.perf_counter() - t0) / args.steps

    total_meas = total_floor = total_flop = 0.0
    for name in ('ema', 'teacher', 'mix', 'opt'):
        ops, convs = count_dispatch_ops(lowered[name])
        fl, by = cost(lowered[name])
        # dispatch floor: convs at the conv fixed cost, everything
        # else at the elementwise fixed cost
        floor = (convs * per_conv + (ops - convs) * per_ew) \
            if ops > 0 else float('nan')
        t_flop = fl / peak if np.isfinite(fl) else float('nan')
        rec = {'program': name, 'entry_ops': ops, 'conv_ops': convs,
               'gflop': round(fl / 1e9, 1),
               'gbytes_accessed': round(by / 1e9, 2),
               'measured_s': round(meas[name], 4),
               'dispatch_floor_s': round(floor, 4),
               'flop_time_s': round(t_flop, 4)}
        print(json.dumps(rec))
        total_meas += meas[name]
        total_floor += floor if np.isfinite(floor) else 0.0
        total_flop += fl if np.isfinite(fl) else 0.0

    mfu = total_flop / total_meas / peak * 100
    print(json.dumps({
        'probe': 'roofline-summary', 'batch': args.batch,
        'measured_sum_s': round(total_meas, 4),
        'dispatch_floor_sum_s': round(total_floor, 4),
        'flop_time_sum_s': round(total_flop / peak, 4),
        'dispatch_floor_share_pct': round(
            100 * total_floor / total_meas, 1),
        'flop_share_pct': round(
            100 * total_flop / peak / total_meas, 1),
        'mfu_pct_vs_measured_peak': round(mfu, 1)}))


if __name__ == '__main__':
    main()
