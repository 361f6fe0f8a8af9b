"""Pipeline parallelism (GPipe) over a ``pipe`` mesh axis.

Beyond the reference (DDP-only): a shard_map GPipe schedule for
homogeneous layer stacks — each device owns one stage's parameters,
microbatches flow device-to-device over ICI via ``lax.ppermute``, and
the whole schedule is ONE ``lax.scan`` inside ONE XLA program, so
forward AND backward (jax transposes the ppermute) pipeline without
host involvement.

Targets constant-activation-shape stacks — exactly the transformer
block stacks of ViT/BEiT/MiT (every block maps (B, N, C) -> (B, N, C)).
The production PFST model (40M-param CNN) does not need pp; this is
the scaling building block for the transformer families, with
numerics asserted equal to sequential execution in
``tests/test_pp.py``.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = 'pipe'


def get_pipe_mesh(n_stages: int = None, devices=None) -> Mesh:
    from .mesh import get_mesh
    devices = list(devices if devices is not None else jax.devices())
    if n_stages is not None:
        if n_stages > len(devices):
            raise ValueError(
                f'{n_stages} pipeline stages need {n_stages} devices, '
                f'only {len(devices)} available')
        devices = devices[:n_stages]
    return get_mesh(devices, axis=PIPE_AXIS)


def stack_stage_params(params_list):
    """[stage0_tree, stage1_tree, ...] -> one tree stacked on axis 0
    (shard the leading axis over ``pipe`` so device i holds stage i)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def shard_stage_params(stacked, mesh: Mesh):
    sh = NamedSharding(mesh, P(PIPE_AXIS))
    return jax.jit(lambda t: t,
                   out_shardings=jax.tree.map(lambda _: sh,
                                              stacked))(stacked)


def gpipe_apply(block_fn: Callable, stacked_params, x,
                mesh: Mesh, n_microbatches: int):
    """``block_{P-1}(... block_0(x))`` with stage i on device i.

    block_fn(stage_params, act) -> act, same shape. ``x`` (B, ...)
    with B divisible by ``n_microbatches``. Differentiable end to end.
    """
    n_dev = mesh.devices.size
    n_stages = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_stages != n_dev:
        raise ValueError(
            f'{n_stages} stacked stages on a {n_dev}-device pipe mesh '
            '— each device must hold exactly one stage (a silent '
            'mismatch would drop stages)')
    m = n_microbatches
    assert x.shape[0] % m == 0, (x.shape, m)
    mb = x.shape[0] // m
    x_mb = x.reshape(m, mb, *x.shape[1:])
    steps = m + n_dev - 1
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def per_device(params_local, x_all):
        params_i = jax.tree.map(lambda a: a[0], params_local)
        d = jax.lax.axis_index(PIPE_AXIS)
        act0 = jnp.zeros((mb,) + x.shape[1:], x.dtype)
        outs0 = jnp.zeros((m, mb) + x.shape[1:], x.dtype)

        def body(carry, t):
            act, outs = carry
            # device 0 injects microbatch t; others consume what the
            # previous stage produced last step (= microbatch t - d)
            inp = jnp.where(d == 0,
                            x_all[jnp.clip(t, 0, m - 1)], act)
            out = block_fn(params_i, inp)
            recv = jax.lax.ppermute(out, PIPE_AXIS, perm)
            # the LAST stage completed microbatch t - (P-1) this step
            mb_idx = t - (n_dev - 1)
            done = (d == n_dev - 1) & (mb_idx >= 0) & (mb_idx < m)
            outs = jnp.where(
                done,
                jax.lax.dynamic_update_index_in_dim(
                    outs, out, jnp.clip(mb_idx, 0, m - 1), 0),
                outs)
            return (recv, outs), None

        (_, outs), _ = jax.lax.scan(body, (act0, outs0),
                                    jnp.arange(steps))
        # only the LAST stage's buffer holds finished microbatches;
        # psum with zeros elsewhere replicates it without gathering
        # every device's (mostly-empty) buffer
        outs = jnp.where(d == n_dev - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, PIPE_AXIS)

    from .mesh import _shard_map
    outs = _shard_map(per_device, mesh=mesh,
                      in_specs=(P(PIPE_AXIS), P()),
                      out_specs=P())(stacked_params, x_mb)
    return outs.reshape(x.shape)
