#!/usr/bin/env python
"""A/B: naive XLA attention vs the Pallas TPU flash kernel.

Shapes are the ViT-family training shapes this framework actually
runs (ViT/BEiT/MAE-base at 512^2 crop, patch 16 -> N=1024 tokens,
12 heads x 64 head-dim), fwd and fwd+bwd.  Protocol per PERF.md:
fresh inputs every rep, timing forced by ``np.asarray``.

Decides whether ``pfst_tpu/ops/attention.py`` enables the fused
kernel by default on TPU (reference has no analogue; torch SDPA is
the closest surface).
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def naive(q, k, v, scale):
    attn = jax.nn.softmax(
        jnp.einsum('bhqd,bhkd->bhqk', q, k,
                   preferred_element_type=jnp.float32) * scale, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def flash(q, k, v, scale):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention)
    return flash_attention(q, k, v, sm_scale=scale).astype(q.dtype)


def bench(fn, shapes, reps=8, warmup=2, grad=False):
    scale = shapes[-1] ** -0.5
    if grad:
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v, scale).astype(jnp.float32) ** 2)
        run = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    else:
        run = jax.jit(functools.partial(fn, scale=scale))
    rs = np.random.RandomState(0)

    def fresh():
        return [jax.device_put(jnp.asarray(
            rs.randn(*shapes).astype(np.float32), jnp.bfloat16))
            for _ in range(3)]

    for _ in range(warmup):
        out = run(*fresh())
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
    times = []
    for _ in range(reps):
        args = fresh()
        t0 = time.perf_counter()
        out = run(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
        times.append(time.perf_counter() - t0)
    return min(times), float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, nargs='*', default=[8])
    ap.add_argument('--seq', type=int, nargs='*', default=[1024, 4096])
    ap.add_argument('--heads', type=int, default=12)
    ap.add_argument('--head-dim', type=int, default=64)
    ap.add_argument('--reps', type=int, default=8)
    args = ap.parse_args()
    print(f'backend={jax.default_backend()}')
    for b in args.batch:
        for n in args.seq:
            shapes = (b, args.heads, n, args.head_dim)
            for grad in (False, True):
                row = {'shape': shapes, 'mode': 'fwd+bwd' if grad else 'fwd'}
                for name, fn in (('naive', naive), ('flash', flash)):
                    try:
                        best, med = bench(fn, shapes, reps=args.reps,
                                          grad=grad)
                        row[name] = f'{best*1e3:.2f}/{med*1e3:.2f} ms'
                        row[name + '_s'] = best
                    except Exception as e:  # noqa: BLE001
                        row[name] = f'ERR {type(e).__name__}: {e}'[:120]
                if 'naive_s' in row and 'flash_s' in row:
                    row['speedup'] = f"{row['naive_s']/row['flash_s']:.2f}x"
                print(row, flush=True)


if __name__ == '__main__':
    main()
