"""ZeRO-1 optimizer-state sharding over the ``data`` mesh (GSPMD).

Goes beyond the reference, whose DDP replicates the full AdamW state
on every GPU (``rsiseg/apis/train.py:104-117`` wraps the model in
``MMDistributedDataParallel``; torch optimizer state is per-rank and
identical). Here the optimizer moments — for AdamW two fp32 trees the
size of the params, the largest replicated training tensors after the
params themselves — are *partitioned* over the ``data`` axis (ZeRO
stage 1, Rajbhandari et al. 2020, "ZeRO: Memory Optimizations Toward
Training Trillion Parameter Models"), expressed purely as
``jax.sharding`` annotations: XLA GSPMD inserts the reduce-scatter /
all-gather collectives riding ICI, nothing is hand-scheduled.

Sharding is layout-only — the step computes the same function as the
unsharded one (asserted in ``tests/test_zero.py``). Each optimizer
leaf is sharded along its largest dimension that divides evenly by the
data-axis length (jit ``out_shardings`` requires exact divisibility);
scalars and leaves with no such dimension stay replicated — for real
models those are biases/norm scales, a rounding error next to the
kernel mirrors.

Like the TP path (``parallel/tp.py``) and unlike the shard_map DDP
path (``parallel/mesh.py``), this is the GSPMD single-program
semantics: BN statistics are computed over the *global* batch (SyncBN
in torch terms — the reference's shipped configs use
``norm_cfg=dict(type='SyncBN')``, ``configs/_base_/models/*.py``) and
one global RNG stream, so it is directly comparable to the
single-device step.

Composes with TP: pass a 2-D ``(data, model)`` mesh and the TP rules;
opt leaves already TP-sharded keep their TP layout and gain the
``data`` axis on a different dimension where possible.

``level=3`` extends the partitioning to the params and the EMA
teacher/fdist trees (ZeRO-3 / FSDP): weights live sharded, XLA
all-gathers each one just-in-time for the op that consumes it and
reduce-scatters its gradient — per-device persistent memory for
params+teacher+moments drops n_data-fold.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS
from .tp import _path_str, _spec_for

__all__ = ['zero_specs', 'shard_state', 'make_zero_train_step',
           'shard_batch', 'opt_state_bytes', 'tree_bytes']


def _zero_spec_for(leaf, n_data: int, base: P) -> P:
    """Spec for one optimizer leaf: shard the largest free dimension
    divisible by n_data over ``data``; keep any existing (TP) axes."""
    ndim = getattr(leaf, 'ndim', 0)
    if ndim == 0 or n_data <= 1:
        return base
    dims = list(base) + [None] * (ndim - len(base))
    free = [(leaf.shape[d], d) for d in range(ndim)
            if dims[d] is None and leaf.shape[d] >= n_data
            and leaf.shape[d] % n_data == 0]
    if not free:
        return base
    _, d = max(free, key=lambda t: (t[0], -t[1]))  # first largest dim
    dims[d] = DATA_AXIS
    return P(*dims)


def zero_specs(state, mesh: Mesh, tp_rules=None, level: int = 1):
    """PartitionSpec pytree for a train state.

    ``level=1`` (ZeRO-1): optimizer-state leaves partitioned over
    ``data`` (+ any TP layout), everything else replicated (or
    TP-sharded when ``tp_rules`` is given).

    ``level=3`` (ZeRO-3 / FSDP): additionally partitions the student
    params, the EMA teacher params, and the frozen fdist reference —
    every persistent model-sized tree.  XLA GSPMD all-gathers each
    weight just before its op consumes it and discards the gathered
    copy after, so per-device *persistent* memory for params drops
    n_data-fold at the cost of per-step all-gather traffic on ICI —
    the FSDP schedule, derived entirely from the layout.  (There is no
    ``level=2``: gradients are not persistent state under jit; XLA
    already reduce-scatters them into the sharded update.)
    """
    assert level in (1, 3), f'zero level must be 1 or 3, got {level}'
    n_data = mesh.shape[DATA_AXIS]

    def base_spec(path, leaf):
        if tp_rules is None:
            return P()
        return _spec_for(_path_str(path), leaf, tp_rules)

    def zero_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: _zero_spec_for(leaf, n_data,
                                              base_spec(path, leaf)),
            tree)

    base_specs = jax.tree_util.tree_map_with_path(base_spec, state)
    updates = dict(opt_state=zero_tree(state.opt_state))
    if level >= 3:
        for field in ('params', 'ema_params', 'imnet_params'):
            tree = getattr(state, field, None)
            if tree:
                updates[field] = zero_tree(tree)
    return base_specs.replace(**updates)


def _shardings(specs, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_state(state, mesh: Mesh, tp_rules=None, level: int = 1):
    """Place a train state with ZeRO-partitioned optimizer leaves
    (level 3: plus param/teacher trees).

    jit-identity with ``out_shardings`` (not ``device_put``) so every
    output owns fresh buffers — the train step donates its state, and
    aliased device-0 shards would be deleted under the caller."""
    shardings = _shardings(zero_specs(state, mesh, tp_rules, level),
                           mesh)
    return jax.jit(lambda t: t, out_shardings=shardings)(state)


def shard_batch(batch, mesh: Mesh):
    """Batch dim over ``data`` (multi-host: per-process shards)."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(  # noqa: E731
            sh, np.asarray(x))
    else:
        put = lambda x: jax.device_put(x, sh)  # noqa: E731
    return jax.tree.map(
        lambda x: put(x)
        if hasattr(x, 'ndim') and x.ndim >= 1 else x, batch)


def make_zero_train_step(algo, tx, mean, std, mesh: Mesh,
                         tp_rules=None, collect_vis: bool = False,
                         level: int = 1):
    """Data-parallel train step with ZeRO optimizer-state partitioning
    (optionally dp×tp when ``tp_rules``/2-D mesh given; ``level=3``
    also partitions the param/teacher trees, FSDP-style).

    The optimizer update runs on each leaf's *shard*: GSPMD turns the
    gradient all-reduce into reduce-scatter along the sharded
    dimension, applies AdamW shard-locally, and all-gathers the new
    params — the ZeRO schedule, derived entirely from the layout."""
    inner = algo.make_train_step(tx, mean, std,
                                 collect_vis=collect_vis,
                                 donate=False, axis_name=None,
                                 jit=False)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    def step(state, batch, rng):
        specs = zero_specs(state, mesh, tp_rules, level)
        constrain = lambda t: jax.tree.map(  # noqa: E731
            lambda x, s: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, s)), t, specs)
        state = constrain(state)
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sh)
            if hasattr(x, 'ndim') and x.ndim >= 1 else x, batch)
        new_state, log_vars, vis = inner(state, batch, rng)
        return constrain(new_state), log_vars, vis

    return jax.jit(step, donate_argnums=(0,))


def tree_bytes(tree) -> Tuple[int, int]:
    """(bytes the tree actually occupies across the local devices,
    bytes full replication would occupy) — the ZeRO memory-saving
    audit used by tests and the dryrun."""
    stored = replicated = 0
    for x in jax.tree.leaves(tree):
        if hasattr(x, 'addressable_shards'):
            stored += sum(s.data.nbytes for s in x.addressable_shards)
            replicated += x.nbytes * len(x.sharding.device_set)
        else:
            stored += getattr(x, 'nbytes', 0)
            replicated += getattr(x, 'nbytes', 0)
    return stored, replicated


def opt_state_bytes(state) -> Tuple[int, int]:
    """ZeRO-1 audit: physical vs replicated bytes of the optimizer
    state alone."""
    return tree_bytes(state.opt_state)
