"""Orbax checkpointing.

TPU-native replacement for mmcv ``CheckpointHook`` + torch ``.pth``
files (reference saves student+teacher+optimizer+iter with meta
CLASSES/PALETTE/config: ``tools/train.py:228-235``,
``apis/train.py:184-191``).  The student-only export path mirrors
``tools/test.py:237-242`` (``--revise_checkpoint_key`` strips the UDA
wrapper prefixes so eval loads a bare segmentor).
"""
from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(work_dir: str) -> str:
    return osp.join(osp.abspath(work_dir), 'ckpt')


_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_pending() -> None:
    """Block until every in-flight async save has committed.

    Call before reading a just-written checkpoint or at process exit.
    Orbax finalizes atomically (tmp dir renamed on commit), so a crash
    mid-save leaves no partial step directory and ``
    find_latest_checkpoint`` falls back to the previous committed step.
    """
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(work_dir: str, step: int, state: Any,
                    meta: Optional[Dict] = None,
                    async_save: bool = False) -> str:
    """Save the full train state under ``{work_dir}/ckpt/{step}``.

    ``async_save=True`` (beyond the reference, which blocks training on
    every torch.save: ``apis/train.py:184-191``) snapshots the arrays
    to host synchronously, then writes to disk on a background thread —
    the train loop overlaps the IO with the next steps.  Pass device
    arrays directly (no ``jax.device_get``) to skip one host copy.

    Multi-process worlds MUST call this collectively on every process
    with the global ``jax.Array`` state (not a host copy): Orbax then
    writes each process's addressable shards and the primary commits —
    the torch pattern of "rank 0 torch.saves" would deadlock Orbax's
    barrier and cannot see ZeRO-3-partitioned weights anyway.
    ``exercised in tests/test_multihost.py``.
    """
    path = osp.join(_ckpt_dir(work_dir), str(int(step)))
    if async_save:
        _async_ckptr().save(path, state, force=True)
    else:
        # a sync save may target a path an async save is still
        # committing (e.g. interval save + final save at the same
        # step) — force=True would rip the tmp dir out from under the
        # background writer
        wait_for_pending()
        ckptr = ocp.PyTreeCheckpointer()
        state = jax.tree.map(lambda x: x, state)  # ensure materialised
        ckptr.save(path, state, force=True)
    if jax.process_index() == 0:  # tiny side files: primary only
        if meta is not None:
            with open(osp.join(_ckpt_dir(work_dir), 'meta.json'),
                      'w') as f:
                json.dump(meta, f, default=str)
        latest = osp.join(_ckpt_dir(work_dir), 'latest')
        with open(latest, 'w') as f:
            f.write(str(int(step)))
    return path


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a checkpoint; with ``target`` given, restores into its
    structure (dtypes/shapes validated)."""
    wait_for_pending()  # a just-issued async save must commit first
    path = osp.abspath(osp.expanduser(path))  # orbax requires absolute
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        if _needs_sharded_restore(target):
            try:
                # carries per-leaf shardings when the target holds
                # global/multi-device jax.Arrays (multi-process restore
                # lands each process's shards directly in place)
                args = ocp.checkpoint_utils.construct_restore_args(
                    target)
                return ckptr.restore(path, item=target,
                                     restore_args=args)
            except Exception:
                pass
        # single-device targets restore as plain host arrays —
        # UNCOMMITTED, so a later jit/shard_map is free to place them
        # on the mesh (restoring with a fresh init's
        # SingleDeviceSharding would pin the whole state to device 0
        # and poison every multi-device step with an
        # incompatible-devices error)
        return ckptr.restore(path, item=target)
    return ckptr.restore(path)


def _needs_sharded_restore(target) -> bool:
    """True when the target holds multi-device or non-addressable
    global arrays (multi-process / mesh-sharded state)."""
    import jax
    if jax.process_count() > 1:
        return True
    for leaf in jax.tree_util.tree_leaves(target):
        sharding = getattr(leaf, 'sharding', None)
        if sharding is None:
            continue
        if not getattr(leaf, 'is_fully_addressable', True):
            return True
        try:
            if len(sharding.device_set) > 1:
                return True
        except Exception:
            pass
    return False


def load_meta(work_dir: str) -> Optional[Dict]:
    p = osp.join(_ckpt_dir(work_dir), 'meta.json')
    if osp.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def extract_student(restored: Any) -> Dict[str, Any]:
    """Student-only variables from a (possibly UDA) train state.

    Works on both raw pytrees and UDATrainState-like dicts — the
    equivalent of stripping ``module.``/``model.`` prefixes in the
    reference (``tools/test.py:237-242``).
    """
    if hasattr(restored, 'params'):
        params = restored.params
        batch_stats = getattr(restored, 'batch_stats', {})
    elif isinstance(restored, dict) and 'params' in restored:
        params = restored['params']
        batch_stats = restored.get('batch_stats', {})
    else:
        raise ValueError('unrecognised checkpoint structure')
    out = {'params': params}
    if batch_stats:
        out['batch_stats'] = batch_stats
    return out
