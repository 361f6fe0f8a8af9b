#!/usr/bin/env python
"""Calibrate the per-op fixed cost on this backend.

convgrad_microbench measured ~1 ms per conv apply regardless of a 16x
FLOP difference between shapes — i.e. a fixed per-iteration floor,
not a compute or HBM roofline.  This probe pins it down:

  tiny-mul   : scan of y = x * c on an (8,128) array — pure loop
               iteration cost, no MXU
  tiny-conv  : scan of a 1x1 conv on (1,8,8,8) — minimal conv op
  big-matmul : scan of a 4096x4096 @ 4096x4096 bf16 matmul (137
               GFLOP) — if fixed overhead amortizes, this should
               approach peak (197 TFLOP/s bf16 on v5e)
  seq-convs  : ONE program with K=32 dependent 3x3 convs at the L2
               shape (no scan — unrolled) vs the scan version; if
               unrolled is much faster the floor is scan/while-loop
               related, if equal it is per-op dispatch inside the
               program
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

DN = ('NHWC', 'HWIO', 'NHWC')


def timed(fn, args, n, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = None
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


def main():
    rs = np.random.RandomState(0)
    recs = []

    # 1. pure scan-iteration cost
    x = jnp.asarray(rs.randn(8, 128), jnp.float32)

    @jax.jit
    def tiny_mul(x):
        def body(c, _):
            return c * jnp.float32(1.0000001), ()
        y, _ = lax.scan(body, x, None, length=1000)
        return y.sum()

    dt = timed(tiny_mul, (x,), 1000)
    recs.append({'probe': 'tiny-mul scan step', 'us': round(dt * 1e6, 1)})

    # 2. minimal conv per scan step
    xc = jnp.asarray(rs.randn(1, 8, 8, 8), jnp.bfloat16)
    wc = jnp.asarray(rs.randn(1, 1, 8, 8) * 0.1, jnp.bfloat16)

    @jax.jit
    def tiny_conv(x, w):
        def body(c, _):
            y = lax.conv_general_dilated(c, w, (1, 1), 'SAME',
                                         dimension_numbers=DN)
            return y * jnp.bfloat16(0.5), ()
        y, _ = lax.scan(body, x, None, length=200)
        return y.astype(jnp.float32).sum()

    dt = timed(tiny_conv, (xc, wc), 200)
    recs.append({'probe': 'tiny-conv scan step', 'us': round(dt * 1e6, 1)})

    # 3. big matmul throughput (137.4 GFLOP per step)
    a = jnp.asarray(rs.randn(4096, 4096) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rs.randn(4096, 4096) * 0.02, jnp.bfloat16)
    gflop = 2.0 * 4096 ** 3 / 1e9

    @jax.jit
    def big_matmul(a, b):
        def body(c, _):
            y = c @ b
            return y * jnp.bfloat16(0.02), ()
        y, _ = lax.scan(body, a, None, length=20)
        return y.astype(jnp.float32).mean()

    dt = timed(big_matmul, (a, b), 20)
    recs.append({'probe': 'big-matmul 4096^3', 'ms': round(dt * 1e3, 3),
                 'tflops': round(gflop / dt / 1e3, 1)})

    # 4. unrolled vs scanned chain of L2-shaped convs
    xl = jnp.asarray(rs.randn(8, 64, 64, 128) * 0.1, jnp.bfloat16)
    wl = jnp.asarray(rs.randn(3, 3, 128, 128) * 0.05, jnp.bfloat16)
    gflop_l2 = 2.0 * 8 * 64 * 64 * 3 * 3 * 128 * 128 / 1e9

    @jax.jit
    def unrolled(x, w):
        for _ in range(32):
            x = lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                         dimension_numbers=DN)
            x = x * jnp.bfloat16(0.05)
        return x.astype(jnp.float32).mean()

    dt = timed(unrolled, (xl, wl), 32)
    recs.append({'probe': 'L2-conv unrolled x32',
                 'ms': round(dt * 1e3, 3),
                 'tflops': round(gflop_l2 / dt / 1e3, 1)})

    @jax.jit
    def scanned(x, w):
        def body(c, _):
            y = lax.conv_general_dilated(c, w, (1, 1), 'SAME',
                                         dimension_numbers=DN)
            return y * jnp.bfloat16(0.05), ()
        y, _ = lax.scan(body, x, None, length=32)
        return y.astype(jnp.float32).mean()

    dt = timed(scanned, (xl, wl), 32)
    recs.append({'probe': 'L2-conv scanned x32',
                 'ms': round(dt * 1e3, 3),
                 'tflops': round(gflop_l2 / dt / 1e3, 1)})

    for r in recs:
        print(json.dumps(r), flush=True)


if __name__ == '__main__':
    main()
