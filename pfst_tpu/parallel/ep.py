"""Expert parallelism (MoE) over an ``expert`` mesh axis.

Completes the parallelism toolbox (dp/tp/pp/sp/ep) beyond the
reference: a Switch-style top-1-routed mixture-of-experts FFN with
each expert's weights living on its own device. Tokens are
capacity-bucketed with the classic cumsum dispatch, exchanged with
``lax.all_to_all`` over ICI so every device computes ONLY its expert,
and combined back scaled by the gate probability. Tokens over
capacity fall through as zeros (Switch semantics) — with enough
capacity the layer is bitwise the dense per-token computation
(asserted in ``tests/test_ep.py``).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

EXPERT_AXIS = 'expert'


def get_expert_mesh(n_experts: int = None, devices=None) -> Mesh:
    from .mesh import get_mesh
    devices = list(devices if devices is not None else jax.devices())
    if n_experts is not None:
        if n_experts > len(devices):
            raise ValueError(
                f'{n_experts} experts need {n_experts} devices, only '
                f'{len(devices)} available')
        devices = devices[:n_experts]
    return get_mesh(devices, axis=EXPERT_AXIS)


# the stacked-tree helper is shared with pipeline parallelism
from .pp import stack_stage_params  # noqa: E402,F401


def top1_dispatch(gate_logits, capacity: int):
    """(T, E) logits -> (probs (T,), expert one-hot dispatch
    (T, E, capacity)) with position-ordered capacity truncation
    (Switch Transformer routing)."""
    t, e = gate_logits.shape
    probs = jax.nn.softmax(gate_logits, axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    gate = jnp.take_along_axis(probs, idx[:, None], axis=1)[:, 0]
    onehot = jax.nn.one_hot(idx, e)                    # (T, E)
    pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot  # (T, E)
    keep = (pos < capacity).astype(onehot.dtype) * onehot
    pos_oh = jax.nn.one_hot(pos.astype(jnp.int32).sum(-1), capacity)
    disp = keep[:, :, None] * pos_oh[:, None, :]       # (T, E, Cap)
    return gate, disp


def moe_apply(expert_fn: Callable, stacked_params, x, gate_w,
              mesh: Mesh, capacity_factor: float = 2.0):
    """Expert-parallel MoE: x (T_global, D) sharded over ``expert``.

    ``expert_fn(params_e, tokens) -> tokens``; ``stacked_params`` has
    each leaf stacked (E, ...) and sharded so device e holds expert e;
    ``gate_w`` (D, E) replicated.
    """
    n_exp = mesh.devices.size
    n_stacked = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_stacked != n_exp:
        raise ValueError(
            f'{n_stacked} stacked experts on a {n_exp}-device expert '
            'mesh — one expert per device required')
    if gate_w.shape[-1] != n_exp:
        raise ValueError(
            f'gate_w routes to {gate_w.shape[-1]} experts but the '
            f'mesh has {n_exp}')
    t_global = x.shape[0]
    assert t_global % n_exp == 0
    t_local = t_global // n_exp
    capacity = max(1, int(capacity_factor * t_local / n_exp))

    def per_device(params_local, x_local, gate_w):
        params_e = jax.tree.map(lambda a: a[0], params_local)
        gate, disp = top1_dispatch(x_local @ gate_w, capacity)
        # bucket my tokens by destination expert: (E, Cap, D)
        send = jnp.einsum('tec,td->ecd', disp, x_local)
        # all_to_all: dim0 becomes the SOURCE device; everything in my
        # buffer is for MY expert
        recv = jax.lax.all_to_all(send, EXPERT_AXIS, split_axis=0,
                                  concat_axis=0, tiled=True)
        flat = recv.reshape(n_exp * capacity, x_local.shape[-1])
        out = expert_fn(params_e, flat)
        out = out.reshape(n_exp, capacity, -1)
        back = jax.lax.all_to_all(out, EXPERT_AXIS, split_axis=0,
                                  concat_axis=0, tiled=True)
        # un-bucket to token positions, scale by the gate probability
        y = jnp.einsum('ecd,tec->td', back, disp)
        return y * gate[:, None]

    from .mesh import _shard_map
    return _shard_map(per_device, mesh=mesh,
                      in_specs=(P(EXPERT_AXIS), P(EXPERT_AXIS), P()),
                      out_specs=P(EXPERT_AXIS))(stacked_params, x,
                                                gate_w)
