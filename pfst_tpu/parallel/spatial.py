"""Spatially-partitioned whole-scene inference.

The sequence-parallel analog for satellite imagery (SURVEY §5 "inputs
too large for one device pass"): instead of tiling a huge scene into
windows (``parallel/slide.py``), shard the scene's HEIGHT axis across
the ``data`` mesh and run ONE ``whole``-mode forward — XLA GSPMD
inserts the conv halo exchanges and the global reductions (image pool,
BN statistics) from the sharding annotation alone, so every device
holds 1/n of each activation. Memory per chip drops ~n-fold, enabling
whole-scene forwards that cannot fit on one device, with collectives
riding ICI.

Exact by construction: sharding is layout-only, so the result matches
the single-device whole-mode forward (asserted in
``tests/test_spatial.py``).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def spatial_sharding(mesh: Mesh):
    """(B, H, W, C) arrays sharded over H."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def spatial_inference(model, variables, scene, mesh: Mesh = None,
                      jit_cache: dict = None, grid=None,
                      softmax: bool = True):
    """scene (H, W, C) or (B, H, W, C) -> probs, H-sharded over the mesh.

    ``softmax=False`` returns pre-softmax logits instead — the eval
    path finalizes views on logits (reference TTA order).

    H must divide by the device count times the model's output stride
    (pad the scene first if not). Pass a dict as ``jit_cache`` to reuse
    the compiled program across calls of the same shape.

    ``grid=(n_h, n_w)`` partitions the scene on a 2-D device grid
    instead (H over ``n_h`` rows, W over ``n_w`` columns) — for scenes
    so large even one H stripe exceeds a chip's HBM. GSPMD inserts the
    halo exchanges on both axes; W must then divide by ``n_w`` too.
    """
    if grid is not None:
        n_h, n_w = grid
        assert mesh is None, 'pass either mesh or grid, not both'
        # reuse the mesh across calls so the jit cache below (keyed on
        # shape + grid) actually hits instead of re-tracing per call
        mesh = (jit_cache or {}).get(('mesh', grid))
        if mesh is None:
            devices = np.asarray(jax.devices()[:n_h * n_w])
            mesh = Mesh(devices.reshape(n_h, n_w),
                        (SPATIAL_AXIS, SPATIAL_W_AXIS))
            if jit_cache is not None:
                jit_cache[('mesh', grid)] = mesh
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))
    batched = scene.ndim == 4
    if not batched:
        scene = scene[None]
    h, w = scene.shape[1], scene.shape[2]
    if grid is not None:
        assert h % grid[0] == 0 and w % grid[1] == 0, \
            f'scene {h}x{w} not divisible by grid {grid} — pad first'
        sharding = NamedSharding(mesh, P(None, SPATIAL_AXIS,
                                         SPATIAL_W_AXIS))
    else:
        n_dev = mesh.devices.size
        assert h % n_dev == 0, \
            f'scene height {h} not divisible by {n_dev} devices — ' \
            'pad first'
        sharding = spatial_sharding(mesh)

    key = ('spatial', tuple(scene.shape),
           grid if grid is not None else id(mesh), softmax)
    fn = (jit_cache or {}).get(key)
    if fn is None:
        sh = sharding
        repl = NamedSharding(mesh, P())
        method = model.inference if softmax else model.inference_logits

        def forward(variables, img):
            out, _ = model.apply(variables, img, method=method)
            return out

        fn = jax.jit(forward,
                     in_shardings=(repl, sh), out_shardings=sh)
        if jit_cache is not None:
            jit_cache[key] = fn

    scene_dev = jax.device_put(scene, sharding)
    variables_dev = jax.device_put(variables,
                                   NamedSharding(mesh, P()))
    probs = fn(variables_dev, scene_dev)
    return probs if batched else probs[0]


# ---------------------------------------------------------------------------
# Spatially-partitioned TRAINING (beyond the reference, which caps the
# trainable crop at one GPU's memory — ``configs/_base_/datasets/
# pots_irrg2vaih_irrg.py`` crops to 512² for exactly that reason).
# Sharding the crop's HEIGHT axis across the mesh lets one *training*
# step run on crops/scenes n× taller than a single chip could hold:
# XLA GSPMD inserts the conv fwd/bwd halo exchanges and turns every
# BN / loss / histogram reduction into a global collective, so the
# step is EXACT vs the single-device step (layout-only change; BN
# batch statistics are computed over the full batch — i.e. sync-BN by
# construction, which *is* the single-device semantics).
# ---------------------------------------------------------------------------

SPATIAL_AXIS = 'spatial'
SPATIAL_W_AXIS = 'spatial_w'


def get_spatial_mesh(n_spatial: int, n_spatial_w: int = 1,
                     devices=None) -> Mesh:
    """(data, spatial[, spatial_w]) mesh; dp = n_devices // (sp·spw).

    With ``n_spatial_w > 1`` the crop is partitioned on a 2-D
    (H, W) grid — for scenes so large even an H-sharded row of chips
    cannot hold one stripe. The W axis is appended only when used so
    existing (data, spatial) callers see the same mesh as before.
    """
    devices = np.asarray(devices if devices is not None
                         else jax.devices())
    total = n_spatial * n_spatial_w
    assert devices.size % total == 0, \
        f'{devices.size} devices not divisible by sp={n_spatial}' \
        f'x spw={n_spatial_w}'
    if n_spatial_w == 1:
        return Mesh(devices.reshape(-1, n_spatial),
                    (DATA_AXIS, SPATIAL_AXIS))
    return Mesh(devices.reshape(-1, n_spatial, n_spatial_w),
                (DATA_AXIS, SPATIAL_AXIS, SPATIAL_W_AXIS))


def spatial_batch_sharding(mesh: Mesh):
    """Batch arrays: dim 0 over ``data``, dim 1 (H) over ``spatial``,
    and dim 2 (W) over ``spatial_w`` when the mesh carries it.

    Applies to (B, H, W, C) images and (B, H, W) label maps alike —
    trailing dims stay unsharded under the prefix spec.
    """
    dp = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    if SPATIAL_W_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(dp, SPATIAL_AXIS, SPATIAL_W_AXIS))
    return NamedSharding(mesh, P(dp, SPATIAL_AXIS))


def shard_spatial_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put every batch array with the (data, spatial) layout."""
    assert jax.process_count() == 1, \
        'spatial training is single-process for now (H-axis shards ' \
        'do not align with per-process loader batch shards)'
    sp = mesh.shape[SPATIAL_AXIS]
    spw = mesh.shape.get(SPATIAL_W_AXIS, 1)
    sh = spatial_batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        if not hasattr(v, 'ndim'):
            out[k] = v
        elif v.ndim >= 3:
            assert v.shape[1] % sp == 0, \
                f'{k}: H={v.shape[1]} not divisible by sp={sp}'
            assert v.shape[2] % spw == 0, \
                f'{k}: W={v.shape[2]} not divisible by spw={spw}'
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = jax.device_put(v, repl)
    return out


def make_spatial_train_step(algo, tx, mean, std, mesh: Mesh,
                            collect_vis: bool = False):
    """GSPMD train step over a (data, spatial) mesh.

    The single-device step (``algo.make_train_step(..., jit=False)``)
    is jitted with replicated-state output shardings; the batch's
    committed (data, spatial) layout (``shard_spatial_batch``) drives
    GSPMD propagation through the whole fwd+bwd program. No shard_map,
    no axis_name: every cross-shard reduction (BN batch stats, loss
    means, ClassMix class histograms, gradients) is inserted by the
    partitioner, so the result is bit-compatible with the unsharded
    step rather than a per-replica approximation of it.

    RNG is replicated — augmentation draws match the single-device
    step exactly (the dp ``shard_map`` path instead folds in the
    replica index to mimic per-rank torch seeds).

    The merged student pass is DISABLED when the mesh's data axis is
    wider than 1: on jax 0.9.0, the weight gradient of a vmapped
    spatial conv whose operand is sharded on BOTH the batch ('data',
    size N > 1) and a spatial axis comes out exactly N x the true
    value (the halo-exchange transpose over-reduces across the data
    axis) while the forward loss stays correct — only a
    gradient-level test catches it. Distilled to a ~30-line repro:
    ``tools/repro_gspmd_vmap_conv_grad.py`` (1x1 convs and data=1
    meshes — including 2-D spatial grids — are unaffected; factor
    equals the data-axis size). The sequential two-pass path is exact
    (1e-7) on the combined mesh. Set PFST_SP_MERGE=1 to re-enable
    (run the repro first on newer toolchains). Both merge-flag
    conventions are handled: PFGST's ``merge_student_passes``
    attribute and the DomainAdaptor family's
    ``cfg['merge_student_passes']`` trace-time gate.
    """
    import copy
    import os
    data_size = mesh.shape.get(DATA_AXIS, 1)
    if data_size > 1 and os.environ.get('PFST_SP_MERGE', '0') != '1':
        algo = copy.copy(algo)
        if getattr(algo, 'merge_student_passes', False):
            algo.merge_student_passes = False
        acfg = getattr(algo, 'cfg', None)
        if hasattr(acfg, 'get') and acfg.get('merge_student_passes',
                                             True):
            algo.cfg = dict(acfg)
            algo.cfg['merge_student_passes'] = False
    inner = algo.make_train_step(tx, mean, std,
                                 collect_vis=collect_vis,
                                 donate=False, axis_name=None,
                                 jit=False)
    repl = NamedSharding(mesh, P())
    step = jax.jit(inner, donate_argnums=(0,),
                   out_shardings=(repl, repl, None))
    # observability for the regression test: report the gate the algo
    # actually reads (PFGST: attribute; DomainAdaptor family: cfg key)
    if hasattr(algo, 'merge_student_passes'):
        step.merged_student_passes = bool(algo.merge_student_passes)
    elif hasattr(getattr(algo, 'cfg', None), 'get'):
        step.merged_student_passes = bool(
            algo.cfg.get('merge_student_passes', True))
    else:
        step.merged_student_passes = False
    return step
