#!/usr/bin/env python
"""On-chip A/B: bf16 vs int8-PTQ fused inference (bench.py protocol).

Answers whether XLA lowers s8xs8->s32 convolutions to the v5e MXU's
int8 mode (2x bf16 peak) for the flagship DeepLabV3+ R50 program, and
what the accuracy cost is (max softmax delta + argmax agreement on the
same random inputs).  Elision-safe protocol as bench.py: varied inputs
per step, host transfer per step, best-of-N reps.

Run on the real chip; writes one JSON line per variant.
"""
import json
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np

import bench


def time_fn(fn, variables, img, steps=20, reps=3):
    imgs = [img + 0.001 * i for i in range(steps)]
    for i in range(3):
        out = fn(variables, imgs[i])
    _ = np.asarray(out[2])
    best = None
    for rep in range(reps):
        imgs = [img + 0.001 * (1 + rep * steps + i) for i in range(steps)]
        jax.block_until_ready(imgs[-1])
        t0 = time.perf_counter()
        outs = [fn(variables, imgs[i]) for i in range(steps)]
        _ = [np.asarray(o[2]) for o in outs]
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / steps


def main():
    from pfst_tpu.utils.set_env import setup_environment
    setup_environment()
    from pfst_tpu.ops.quant import int8_inference

    fn, variables, img = bench.build()
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(*img.shape), jnp.float32)

    t_bf16 = time_fn(fn, variables, img)
    print(json.dumps({'variant': 'bf16', 's_per_batch': round(t_bf16, 4),
                      'patches_per_sec': round(bench.BATCH / t_bf16, 1)}),
          flush=True)
    ref_label = np.asarray(fn(variables, img)[0])

    try:
        with int8_inference():
            qfn = jax.jit(fn.__wrapped__)  # re-trace inside the context
            t_int8 = time_fn(qfn, variables, img)
            q_label = np.asarray(qfn(variables, img)[0])
        agree = float((q_label == ref_label).mean())
        print(json.dumps({'variant': 'int8-ptq',
                          's_per_batch': round(t_int8, 4),
                          'patches_per_sec': round(bench.BATCH / t_int8, 1),
                          'speedup_vs_bf16': round(t_bf16 / t_int8, 2),
                          'argmax_agreement': round(agree, 4)}),
              flush=True)
    except Exception as e:
        print(json.dumps({'variant': 'int8-ptq',
                          'error': f'{type(e).__name__}: {e}'}),
              flush=True)


if __name__ == '__main__':
    main()
