"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL stack
(``apis/train.py:104-117``, ``configs/_base_/default_runtime.py:38``):
a 1-D ``data`` mesh over all local/global devices; the train step is
``shard_map``-ped so every replica computes on its batch shard with
per-replica BN statistics (mirroring ``broadcast_buffers=False`` DDP)
and gradients are averaged with a single fused ``psum`` riding ICI.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host init (the ``init_dist`` equivalent).

    With an explicit coordinator, initializes directly. Without one,
    falls back to jax's cluster auto-detection when a multi-task
    Slurm/OpenMPI environment is visible (so ``--launcher jax`` under
    ``srun --ntasks>1`` forms one world instead of N duplicate
    single-host jobs). No-op when single-process.
    """
    import os
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes,
                                   process_id)
        return
    ntasks = int(os.environ.get('SLURM_NTASKS') or
                 os.environ.get('OMPI_COMM_WORLD_SIZE') or 1)
    if ntasks > 1:
        jax.distributed.initialize()  # Slurm/MPI auto-detection


def get_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a batch with the leading dim over the mesh.

    Single-process: a plain sharded device_put. Multi-host: each
    process holds only ITS loader shard (rank-sharded in
    ``datasets/builder.py``), so the global array is assembled from
    the per-process locals — device_put of a host-local array onto a
    mesh with non-addressable devices is not valid.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        put = lambda x: jax.make_array_from_process_local_data(  # noqa: E731
            sh, np.asarray(x))
    else:
        put = lambda x: jax.device_put(x, sh)  # noqa: E731
    return jax.tree.map(
        lambda x: put(x)
        if hasattr(x, 'ndim') and x.ndim >= 1 else x, batch)


def make_sharded_train_step(algo, tx, mean, std, mesh: Mesh,
                            collect_vis: bool = False):
    """DDP-equivalent train step over the data mesh.

    - state replicated, batch sharded on dim 0;
    - each replica sees its shard with its own BN batch stats
      (per-replica BN like the reference's plain ``BN`` +
      ``broadcast_buffers=False``);
    - grads/log-vars ``pmean`` over ICI inside the same XLA program;
    - running BN stats are also ``pmean``-synced so eval is
      replica-independent (the reference instead broadcasts rank-0
      buffers before eval: ``eval_hooks.py:100-106``);
    - per-replica RNG folds in the axis index so augmentations differ
      across replicas like per-rank torch seeds.
    """
    shard_map = _shard_map

    inner = algo.make_train_step(tx, mean, std, collect_vis=collect_vis,
                                 donate=False, axis_name=DATA_AXIS,
                                 jit=False)

    def step(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        return inner(state, batch, rng)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(DATA_AXIS)))
    return jax.jit(sharded, donate_argnums=(0,))


def _shard_map(f, mesh, in_specs, out_specs):
    """jax.shard_map across API generations (check_rep → check_vma)."""
    import inspect
    try:
        fn = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map as fn
    kw = ('check_vma'
          if 'check_vma' in inspect.signature(fn).parameters
          else 'check_rep')
    return fn(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
              **{kw: False})
