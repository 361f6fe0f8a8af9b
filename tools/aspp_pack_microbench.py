#!/usr/bin/env python
"""Is packing the four ASPP 2048->512 pointwise convs worth it?

PERF.md round-2 listed "pack the four pointwise convs into one
matmul" as a candidate inference lever.  This isolates exactly that
op pattern at the flagship head's shapes (batch 24, 64x64 spatial,
2048 -> 512, bf16) and times separate vs batched-einsum execution —
plus the s2d-stem question (3x3/s2 conv on 3 channels vs the
space-to-depth 2x2 rewrite) at stem shapes.

Evidence-before-surgery: the packed variant only earns model-code
plumbing if it wins here.
"""
import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(f, args_list, label):
    out = f(*args_list[0])
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        outs = [f(*a) for a in args_list]
        # tiny on-device slice per output, ONE host sync at the end —
        # materializing full outputs would swamp the timing with
        # device->host transfer and hold ~400 MB per step alive
        probes = [jax.tree_util.tree_leaves(o)[0].ravel()[0]
                  for o in outs]
        _ = [np.asarray(pv) for pv in probes]
        del outs, probes
        dt = (time.perf_counter() - t0) / len(args_list)
        best = dt if best is None else min(best, dt)
    rec = {'op': label, 'ms': round(best * 1e3, 2)}
    print(json.dumps(rec))
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=24)
    p.add_argument('--hw', type=int, default=64)
    p.add_argument('--cin', type=int, default=2048)
    p.add_argument('--cout', type=int, default=512)
    p.add_argument('--steps', type=int, default=4)  # 4 live input
    #   sets of (4 x 24x64x64x2048 bf16) ~= 6.4 GB; 8 OOMs the chip
    a = p.parse_args()

    rs = np.random.RandomState(0)
    b, hw, cin, cout = a.batch, a.hw, a.cin, a.cout

    ws = [jnp.asarray(rs.randn(cin, cout) * 0.02, jnp.bfloat16)
          for _ in range(4)]
    bias = [jnp.asarray(rs.randn(cout) * 0.02, jnp.bfloat16)
            for _ in range(4)]
    wstack = jnp.stack(ws)            # (4, cin, cout)
    bstack = jnp.stack(bias)

    @jax.jit
    def separate(xs):
        outs = [jax.nn.relu(x.reshape(b * hw * hw, cin) @ w + bb)
                for x, w, bb in zip(xs, ws, bias)]
        return jnp.concatenate(
            [o.reshape(b, hw, hw, cout) for o in outs], axis=-1)

    @jax.jit
    def packed(xs):
        xg = jnp.stack([x.reshape(b * hw * hw, cin) for x in xs])
        out = jax.nn.relu(
            jnp.einsum('gmc,gco->gmo', xg, wstack,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16) +
            bstack[:, None, :])
        return out.transpose(1, 0, 2).reshape(b, hw, hw, 4 * cout)

    def fresh():
        return tuple(
            jnp.asarray(rs.randn(b, hw, hw, cin) * 0.1, jnp.bfloat16)
            for _ in range(4))

    args_list = [(fresh(),) for _ in range(a.steps)]
    jax.block_until_ready(args_list[-1])
    t_sep = timed(separate, args_list, 'aspp pointwise x4 separate')
    t_pack = timed(packed, args_list, 'aspp pointwise x4 packed')
    flops = 4 * 2 * b * hw * hw * cin * cout
    print(json.dumps({
        'separate_tflops': round(flops / t_sep / 1e12, 1),
        'packed_tflops': round(flops / t_pack / 1e12, 1),
        'packed_speedup': round(t_sep / t_pack, 3)}))

    # ---- stem variant at inference shapes -----------------------
    size = 512
    kern = jnp.asarray(rs.randn(3, 3, 3, 32) * 0.05, jnp.bfloat16)

    @jax.jit
    def stem_plain(x):
        return jax.lax.conv_general_dilated(
            x, kern, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    @jax.jit
    def stem_s2d(x):
        bb, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h2, w2 = (h + 2) // 2, (w + 2) // 2
        s = xp.reshape(bb, h2, 2, w2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(bb, h2, w2, 4 * c)
        k4 = jnp.pad(kern, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k = k4.reshape(2, 2, 2, 2, 3, 32).transpose(
            0, 2, 1, 3, 4, 5).reshape(2, 2, 12, 32)
        return jax.lax.conv_general_dilated(
            s, k, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    xs = [jnp.asarray(rs.randn(b, size, size, 3) * 0.1, jnp.bfloat16)
          for _ in range(a.steps)]
    jax.block_until_ready(xs)
    t_p = timed(stem_plain, [(x,) for x in xs], 'stem conv 3x3/s2')
    t_s = timed(stem_s2d, [(x,) for x in xs], 'stem conv s2d 2x2/s1')
    print(json.dumps({'s2d_stem_speedup': round(t_p / t_s, 3)}))


if __name__ == '__main__':
    main()
