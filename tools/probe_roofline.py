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


def count_dispatch_ops(compiled) -> int:
    """Count dispatchable roots in the optimized HLO entry module."""
    try:
        txt = compiled.as_text()
    except Exception:
        return -1
    # entry computation lines like:  %x = f32[...] fusion(...),
    # plus non-fused roots: convolution/custom-call/all-reduce/copy
    n = 0
    for op in ('fusion', 'convolution', 'custom-call', 'all-reduce',
               'all-gather', 'reduce-scatter', 'copy-start',
               'dynamic-slice', 'dynamic-update-slice', 'scatter',
               'while'):
        n += len(re.findall(rf'= [^=]*{op}\(', txt))
    return n


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

    # per-op: unrolled chain of dependent tiny convs (each its own
    # dispatch, negligible FLOPs/bytes)
    xc = jnp.asarray(rs.randn(1, 8, 8, 8), jnp.bfloat16)
    wc = jnp.asarray(rs.randn(1, 1, 8, 8) * 0.1, jnp.bfloat16)
    DN = ('NHWC', 'HWIO', 'NHWC')

    @jax.jit
    def chain64(x, w):
        for _ in range(64):
            x = lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                         dimension_numbers=DN)
        return x.astype(jnp.float32).sum()

    per_op = timed(chain64, (xc, wc), 64)

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
    return per_op, peak, bw


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

    per_op, peak, bw = probe_machine(jnp, jax)
    print(json.dumps({'probe': 'machine',
                      'per_op_us': round(per_op * 1e6, 1),
                      'peak_tflops': round(peak / 1e12, 1),
                      'hbm_gbps': round(bw / 1e9, 1)}))

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

    total_meas = total_model = total_ops = 0.0
    total_flop = 0.0
    for name in ('ema', 'teacher', 'mix', 'opt'):
        ops = count_dispatch_ops(lowered[name])
        fl, by = cost(lowered[name])
        t_ops = ops * per_op if ops > 0 else float('nan')
        t_flop = fl / peak if np.isfinite(fl) else float('nan')
        t_hbm = by / bw if np.isfinite(by) else float('nan')
        model = (t_ops if np.isfinite(t_ops) else 0.0) + \
            max(t_flop if np.isfinite(t_flop) else 0.0,
                t_hbm if np.isfinite(t_hbm) else 0.0)
        rec = {'program': name, 'dispatch_ops': ops,
               'gflop': round(fl / 1e9, 1),
               'gbytes': round(by / 1e9, 2),
               'measured_s': round(meas[name], 4),
               'model_ops_s': round(t_ops, 4),
               'model_flop_s': round(t_flop, 4),
               'model_hbm_s': round(t_hbm, 4),
               'model_total_s': round(model, 4)}
        print(json.dumps(rec))
        total_meas += meas[name]
        total_model += model
        total_ops += t_ops if np.isfinite(t_ops) else 0.0
        total_flop += fl if np.isfinite(fl) else 0.0

    mfu = total_flop / total_meas / peak * 100
    print(json.dumps({
        'probe': 'roofline-summary', 'batch': args.batch,
        'measured_s_per_iter': round(total_meas, 4),
        'model_s_per_iter': round(total_model, 4),
        'dispatch_overhead_s': round(total_ops, 4),
        'dispatch_share_pct': round(100 * total_ops / total_meas, 1),
        'mfu_pct_vs_measured_peak': round(mfu, 1)}))


if __name__ == '__main__':
    main()
