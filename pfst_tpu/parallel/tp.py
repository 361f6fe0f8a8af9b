"""Tensor-parallel (GSPMD) training over a 2-D ``(data, model)`` mesh.

Goes beyond the reference, whose only multi-device strategy is DDP
(``rsiseg/apis/train.py:104-117``): for the transformer model families
(ViT/BEiT/MAE/Swin/MiT/Twins — all attention blocks here share the
``qkv|q|k|v / proj / fc1 / fc2`` module naming) the block weights are
Megatron-sharded over a ``model`` axis while the batch stays sharded
over ``data``:

- ``qkv``/``q``/``k``/``v`` and ``fc1`` kernels column-sharded
  (output features on ``model``), biases sharded to match;
- ``proj`` and ``fc2`` kernels row-sharded (input features on
  ``model``), so each attention/MLP pair costs one all-reduce riding
  ICI — XLA GSPMD inserts it from the sharding annotations alone.

Sharding annotations are layout-only: the step computes bitwise the
same function as the unsharded one (asserted in
``tests/test_tp.py``), so this composes with any orchestrator exposing
``make_train_step`` (the supervised trainer or a UDA wrapper).

Note one intended semantic difference from ``mesh.make_sharded_train_step``
(the shard_map DDP path): under GSPMD the BN batch statistics are
computed over the *global* batch — SyncBN semantics — rather than
per-replica.
"""
from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'

# (path-suffix regex, spec) — first match wins; unmatched leaves are
# replicated. Paths are '/'-joined pytree key paths, so the same rules
# hit the params tree and the optimizer's mu/nu mirrors of it.
DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r'/(qkv|q|k|v|fc1)/kernel$', P(None, MODEL_AXIS)),
    (r'/(qkv|q|k|v|fc1)/bias$', P(MODEL_AXIS)),
    (r'/(proj|fc2)/kernel$', P(MODEL_AXIS, None)),
)


def get_2d_mesh(n_model: int, devices=None) -> Mesh:
    """``(data, model)`` mesh using all devices; data = n // n_model."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % n_model == 0, f'{n} devices not divisible by tp={n_model}'
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _path_str(path) -> str:
    parts = []
    for k in path:
        name = getattr(k, 'key', None)
        if name is None:
            name = getattr(k, 'name', None)
        if name is None:
            name = getattr(k, 'idx', k)
        parts.append(str(name))
    return '/' + '/'.join(parts)


def _spec_for(path_str: str, leaf, rules) -> P:
    if getattr(leaf, 'ndim', 0) == 0:
        return P()
    for pattern, spec in rules:
        if re.search(pattern, path_str):
            if len(spec) <= leaf.ndim:
                return spec
            return P()
    return P()


def tree_specs(tree, rules=DEFAULT_TP_RULES):
    """PartitionSpec pytree for any state/params tree (suffix rules
    also catch the params mirrored inside optax mu/nu)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_str(path), leaf, rules), tree)


def shard_state(state, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """Place a train state: TP-matched leaves sharded, rest replicated.

    Uses a jit-identity with ``out_shardings`` rather than
    ``device_put`` so every output owns fresh buffers — ``device_put``
    can alias the source's device-0 shard, and the train step donates
    its state argument, which would silently delete the caller's
    original arrays.
    """
    specs = tree_specs(state, rules)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.jit(lambda t: t, out_shardings=shardings)(state)


def shard_batch_2d(batch, mesh: Mesh):
    """Batch dim over ``data``, replicated over ``model``.

    Multi-host: assemble the global array from per-process loader
    shards (see ``mesh.shard_batch``).
    """
    sh = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(  # noqa: E731
            sh, np.asarray(x))
    else:
        put = lambda x: jax.device_put(x, sh)  # noqa: E731
    return jax.tree.map(
        lambda x: put(x)
        if hasattr(x, 'ndim') and x.ndim >= 1 else x, batch)


def make_tp_train_step(algo, tx, mean, std, mesh: Mesh,
                       rules=DEFAULT_TP_RULES,
                       collect_vis: bool = False):
    """dp×tp train step: same math as the single-device step, laid out
    over the 2-D mesh via sharding constraints (GSPMD inserts the
    gradient all-reduce over ``data`` and the Megatron all-reduces
    over ``model``)."""
    inner = algo.make_train_step(tx, mean, std, collect_vis=collect_vis,
                                 donate=False, axis_name=None, jit=False)

    def constrain_state(state):
        specs = tree_specs(state, rules)
        return jax.tree.map(
            lambda x, s: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, s)), state, specs)

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    def step(state, batch, rng):
        state = constrain_state(state)
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sh)
            if hasattr(x, 'ndim') and x.ndim >= 1 else x, batch)
        new_state, log_vars, vis = inner(state, batch, rng)
        return constrain_state(new_state), log_vars, vis

    return jax.jit(step, donate_argnums=(0,))
