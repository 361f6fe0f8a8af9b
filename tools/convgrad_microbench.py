#!/usr/bin/env python
"""Per-op conv forward/backward speed at the R50-OS8 training shapes.

The training step measures ~26% MFU where the eval-mode inference
bench reaches ~64% (PERF.md).  This probe times, for each conv shape
that carries the FLOPs in DeepLabV3+ R50-d8 at batch 8 / 512^2 crop:

  fwd   : conv_general_dilated forward
  g_in  : gradient w.r.t. the input  (backprop-data)
  g_flt : gradient w.r.t. the filter (backprop-filter)

each as its own jitted program (sustained chain, fresh device-resident
inputs, one block at the end — the tunneled-backend protocol from
PERF.md), and prints achieved TFLOP/s per pass.  If g_flt of the
dilated 3x3 convs (L3 d2, L4 d4) craters vs their d1 twins, the
training ceiling is XLA's backprop-filter for dilated convolutions,
not the framework.
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


def conv(x, w, d):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding='SAME',
        rhs_dilation=(d, d), dimension_numbers=DN,
        preferred_element_type=jnp.float32)


def bench_one(name, b, h, w_, cin, cout, k, d, steps, dtype):
    gflop = 2.0 * b * h * w_ * k * k * cin * cout / 1e9
    rs = np.random.RandomState(0)
    wgt = jnp.asarray(rs.randn(k, k, cin, cout) * 0.05, dtype)

    fwd = jax.jit(lambda x, wt: conv(x, wt, d))
    g_in = jax.jit(jax.grad(
        lambda x, wt: conv(x, wt, d).astype(jnp.float32).sum(), 0))
    g_flt = jax.jit(jax.grad(
        lambda x, wt: conv(x, wt, d).astype(jnp.float32).sum(), 1))

    rec = {'shape': name, 'gflop_per_pass': round(gflop, 1),
           'dtype': str(dtype.dtype.name if hasattr(dtype, 'dtype')
                        else np.dtype(dtype).name)}
    for tag, fn in (('fwd', fwd), ('g_in', g_in), ('g_flt', g_flt)):
        xs = [jnp.asarray(rs.randn(b, h, w_, cin) * 0.1, dtype)
              for _ in range(steps)]
        jax.block_until_ready(xs)
        out = fn(xs[0], wgt)          # compile
        _ = np.asarray(out, np.float32).ravel()[:1]
        t0 = time.perf_counter()
        outs = [fn(x, wgt) for x in xs]
        _ = np.asarray(outs[-1], np.float32).ravel()[:1]
        dt = (time.perf_counter() - t0) / steps
        rec[tag + '_ms'] = round(dt * 1e3, 2)
        rec[tag + '_tflops'] = round(gflop / dt / 1e3, 1)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=12)
    ap.add_argument('--dtype', default='bf16',
                    choices=['bf16', 'fp32'])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
    for shape in SHAPES:
        bench_one(*shape, steps=args.steps, dtype=dtype)


if __name__ == '__main__':
    main()
