#!/usr/bin/env python
"""Isolate train-mode BatchNorm cost on this backend.

Ten conv(3x3, C->C) + BN + ReLU layers at a fixed activation shape,
timed (sustained chain, fresh inputs, one block) in four variants:

  eval-bn   : BN uses running stats (inference mode — fusable)
  train-bn  : BN computes batch statistics (training mode)
  no-bn     : convs + ReLU only
  train-gn  : GroupNorm (a training-mode norm with per-sample stats)

If train-bn >> eval-bn the training throughput ceiling is the
batch-stat normalization pattern, not the convs.
"""
import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class Stack(nn.Module):
    norm: str
    channels: int = 64
    depth: int = 10
    dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.depth):
            x = nn.Conv(self.channels, (3, 3), padding=1,
                        use_bias=False, dtype=self.dtype,
                        name=f'conv{i}')(x)
            if self.norm == 'bn':
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, dtype=self.dtype,
                                 name=f'bn{i}')(x)
            elif self.norm == 'gn':
                x = nn.GroupNorm(num_groups=8, dtype=self.dtype,
                                 name=f'gn{i}')(x)
            x = nn.relu(x)
        return x


def bench(variant, batch, size, channels, depth, steps=15):
    norm = {'eval-bn': 'bn', 'train-bn': 'bn', 'no-bn': 'none',
            'train-gn': 'gn'}[variant]
    train = variant in ('train-bn', 'train-gn')
    model = Stack(norm=norm, channels=channels, depth=depth)
    x0 = jnp.zeros((batch, size, size, channels), jnp.bfloat16)
    variables = jax.jit(lambda r, im: model.init(
        {'params': r}, im, train=False))(jax.random.PRNGKey(0), x0)

    if norm == 'bn' and train:
        @jax.jit
        def f(v, x):
            y, _ = model.apply(v, x, train=True,
                               mutable=['batch_stats'])
            return jnp.mean(y.astype(jnp.float32))
    else:
        @jax.jit
        def f(v, x):
            y = model.apply(v, x, train=train)
            return jnp.mean(y.astype(jnp.float32))

    rs = np.random.RandomState(0)
    xs = [rs.randn(batch, size, size, channels).astype(np.float32)
          for _ in range(steps)]
    out = f(variables, xs[0])
    _ = np.asarray(out)
    best = None
    for rep in range(2):
        xs = [rs.randn(batch, size, size, channels).astype(np.float32)
              for _ in range(steps)]
        t0 = time.perf_counter()
        outs = [f(variables, x) for x in xs]
        _ = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / steps
        best = dt if best is None else min(best, dt)
    flops = 2 * depth * batch * size * size * 9 * channels * channels
    rec = {'variant': variant, 'batch': batch, 'size': size,
           'channels': channels, 'depth': depth,
           'ms_per_iter': round(best * 1e3, 2),
           'achieved_tflops': round(flops / best / 1e12, 1)}
    print(json.dumps(rec))
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--size', type=int, default=128)
    p.add_argument('--channels', type=int, default=64)
    p.add_argument('--depth', type=int, default=10)
    p.add_argument('--variants', nargs='*',
                   default=['eval-bn', 'train-bn', 'no-bn',
                            'train-gn'])
    a = p.parse_args()
    for v in a.variants:
        bench(v, a.batch, a.size, a.channels, a.depth)


if __name__ == '__main__':
    main()
