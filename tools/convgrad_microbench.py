#!/usr/bin/env python
"""Per-op conv forward/backward speed at the R50-OS8 training shapes.

The training step measures ~26% MFU where the eval-mode inference
bench reaches ~64% (PERF.md).  This probe times, for each conv shape
that carries the FLOPs in DeepLabV3+ R50-d8 at batch 8 / 512^2 crop:

  fwd   : conv_general_dilated forward
  g_in  : backprop-data — transposed conv against a cotangent that
          VARIES per step (conv is linear in x, so grad-of-sum would
          be input-independent and XLA hoists it out of the loop —
          the naive version measured >peak "TFLOP/s")
  g_flt : backprop-filter (gradient w.r.t. the filter)

Protocol for the tunneled backend: a single conv is sub-millisecond
while each program dispatch costs ~15 ms, so each pass is timed as
ONE jitted ``lax.scan`` over STEPS pre-stacked independent inputs
(only a scalar mean per step leaves the loop; per-step overhead is
tens of µs).  Prints achieved TFLOP/s per pass.  If g_flt of the
dilated 3x3 convs (L3 d2, L4 d4) cratered vs their d1 twins, the
training ceiling would be XLA's backprop-filter for dilated
convolutions — measured: it does not (see PERF.md).
"""
import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# (name, batch, H, W, Cin, Cout, k, dilation) — batch-8 512^2 OS8
SHAPES = [
    ('L1 3x3 d1', 8, 128, 128, 64, 64, 3, 1),
    ('L2 3x3 d1', 8, 64, 64, 128, 128, 3, 1),
    ('L3 3x3 d2', 8, 64, 64, 256, 256, 3, 2),
    ('L3 3x3 d1(ctrl)', 8, 64, 64, 256, 256, 3, 1),
    ('L4 3x3 d4', 8, 64, 64, 512, 512, 3, 4),
    ('L4 3x3 d1(ctrl)', 8, 64, 64, 512, 512, 3, 1),
    ('L3 1x1 expand', 8, 64, 64, 256, 1024, 1, 1),
    ('head 3x3 2560->512', 8, 64, 64, 2560, 512, 3, 1),
    ('stem 3x3 256^2', 8, 256, 256, 64, 64, 3, 1),
]

DN = ('NHWC', 'HWIO', 'NHWC')
MAX_STACK_BYTES = 2 << 30


def conv(x, w, d):
    # No preferred_element_type: with a f32 accumulator type the
    # transpose rule feeds a f32 cotangent into a bf16 conv and
    # conv_general_dilated rejects the dtype mix.  TPU bf16 convs
    # accumulate in f32 on the MXU regardless.
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding='SAME',
        rhs_dilation=(d, d), dimension_numbers=DN)


def _timed_scan(pass_fn, stacked, wgt, n):
    """One jitted program: scan pass_fn over the leading axis of the
    (pytree of) stacked operands, emitting only a per-step scalar."""
    @jax.jit
    def run(xs, w):
        def body(acc, x):
            y = pass_fn(x, w)
            return acc + y.astype(jnp.float32).mean(), ()
        acc, _ = lax.scan(body, jnp.float32(0), xs)
        return acc

    out = run(stacked, wgt)                   # compile + warm
    _ = float(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(stacked, wgt))          # host sync via float()
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def bench_one(name, b, h, w_, cin, cout, k, d, dtype, steps):
    gflop = 2.0 * b * h * w_ * k * k * cin * cout / 1e9
    rs = np.random.RandomState(0)
    wgt = jnp.asarray(rs.randn(k, k, cin, cout) * 0.05, dtype)

    xbytes = b * h * w_ * cin * np.dtype(
        np.float16 if dtype == jnp.bfloat16 else np.float32).itemsize
    n = max(4, min(steps, MAX_STACK_BYTES // max(xbytes, 1)))

    def stack(c):
        return jnp.asarray(
            rs.randn(n, b, h, w_, c).astype(np.float32) * 0.1, dtype)

    rec = {'shape': name, 'gflop_per_pass': round(gflop, 1),
           'dtype': np.dtype(dtype).name if not hasattr(dtype, 'dtype')
           else dtype.dtype.name, 'steps': n}

    xs = stack(cin)
    rec_t = _timed_scan(lambda x, w: conv(x, w, d), xs, wgt, n)
    rec['fwd_ms'] = round(rec_t * 1e3, 3)
    rec['fwd_tflops'] = round(gflop / rec_t / 1e3, 1)

    # g_in: transpose conv applied to a varying cotangent (cout ch)
    cts = stack(cout)

    def gin(ct, w):
        _, vjp = jax.vjp(lambda xx: conv(xx, w, d), xs[0])
        return vjp(ct)[0]

    rec_t = _timed_scan(gin, cts, wgt, n)
    rec['g_in_ms'] = round(rec_t * 1e3, 3)
    rec['g_in_tflops'] = round(gflop / rec_t / 1e3, 1)
    del cts

    # g_flt: filter gradient with BOTH activations and cotangent
    # varying per step (an all-ones cotangent is a constant operand
    # XLA could algebraically simplify away)
    cts = stack(cout)

    def gflt(x_ct, w):
        x, ct = x_ct
        _, vjp = jax.vjp(lambda wt: conv(x, wt, d), w)
        return vjp(ct)[0]

    rec_t = _timed_scan(gflt, (xs, cts), wgt, n)
    rec['g_flt_ms'] = round(rec_t * 1e3, 3)
    rec['g_flt_tflops'] = round(gflop / rec_t / 1e3, 1)

    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dtype', default='bf16',
                    choices=['bf16', 'fp32'])
    ap.add_argument('--steps', type=int, default=30)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    for shape in SHAPES:
        bench_one(*shape, dtype=dtype, steps=args.steps)


if __name__ == '__main__':
    main()
