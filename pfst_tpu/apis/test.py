"""Evaluation API (mirror of ``rsiseg/apis/test.py:36-287``).

``single_gpu_test`` streams the test set through a jitted inference
function (shape-bucketed by XLA's jit cache), undoes TTA flips,
rescales to the original shape and accumulates per-image
(intersect, union) histograms on device (the reference's ``pre_eval``
protocol).  ``multi_device_test`` shards images across local devices.
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logger import get_root_logger, print_log


def _meta(metas, key, default=None):
    m = metas[0] if isinstance(metas, list) else metas
    if isinstance(m, list):
        m = m[0]
    return m.get(key, default)


def make_inference_fn(model, rescale: bool = True):
    """jitted: (variables, img NHWC) -> pre-softmax logits NHWC at
    input size.  View finalization rescales the LOGITS to the original
    shape and softmaxes after, matching the reference's TTA order
    (``encoder_decoder.py:284-310``: ``whole_inference`` rescales the
    logit, ``inference`` softmaxes the result)."""

    @jax.jit
    def infer(variables, img):
        logits, _ = model.apply(variables, img,
                                method=model.inference_logits)
        return logits

    return infer


def make_spatial_inference_fn(model, n_spatial: int):
    """Whole-image forward with the H axis GSPMD-sharded over
    ``n_spatial`` devices (``parallel/spatial.py``) — evaluates scenes
    too large for one chip's HBM. Heights that do not divide by the
    mesh are edge-padded and the probs cropped back; note that with
    image-pooling heads (ASPP) the padded rows enter the global pool,
    so prefer heights divisible by the mesh for bit-exactness."""
    from jax.sharding import Mesh

    from ..parallel import spatial as sp_mod
    from ..parallel.mesh import DATA_AXIS
    devs = jax.devices()
    assert n_spatial <= len(devs), \
        f'spatial={n_spatial} exceeds {len(devs)} devices'
    mesh = Mesh(np.asarray(devs[:n_spatial]), (DATA_AXIS,))
    cache: Dict[Any, Any] = {}

    def infer(variables, img):
        h = img.shape[1]
        pad = (-h) % n_spatial
        if pad:
            img = jnp.pad(img, ((0, 0), (0, pad), (0, 0), (0, 0)),
                          mode='edge')
        logits = sp_mod.spatial_inference(model, variables, img, mesh,
                                          jit_cache=cache,
                                          softmax=False)
        return logits[:, :h] if pad else logits

    return infer


def make_state_fn(model, sim_cfg: Optional[dict] = None):
    """jitted feature-state extractor (reference ``apis/test.py:160-191``
    ``state_proc_fun``): neighborhood similarity of the decoded
    features, returned per image alongside predictions."""
    sim_cfg = sim_cfg or {}

    @jax.jit
    def states(variables, img):
        from ..ops.pallas_sim import neighborhood_similarity
        _, st = model.apply(variables, img, method=model.encode_decode)
        feats = st['decoded_features']
        sim = neighborhood_similarity(
            feats, sim_cfg.get('kernel_size', 3),
            sim_cfg.get('dilation', 2),
            sim_type=sim_cfg.get('sim_type', 'gaussian'),
            sigma=float(sim_cfg.get('sigma', 30.0)))
        return {'decoded_features': feats, 'sim_feat': sim,
                'seg_logits': st['seg_logits']}

    return states


def _finalize_views(model, view_logits, metas, ori_shape):
    """Undo TTA flips, rescale each view's LOGITS to ``ori_shape``,
    softmax, average and argmax — identical math for the single- and
    multi-device paths, and the reference's order
    (``encoder_decoder.py:284-327`` + ``aug_test``: resize logit ->
    softmax -> flip-undo -> mean over views; flip commutes with the
    per-pixel softmax)."""
    acc = None
    for logits, meta in zip(view_logits, metas):
        if meta.get('flip', False):
            dirs = meta.get('flip_direction') or []
            dirs = dirs if isinstance(dirs, list) else [dirs]
            for d in dirs:
                logits = jnp.flip(logits, axis=2 if d == 'horizontal'
                                  else 1)
        if tuple(logits.shape[1:3]) != tuple(ori_shape):
            from ..ops import resize
            logits = resize(logits, size=ori_shape, mode='bilinear',
                            align_corners=model.align_corners)
        probs = jax.nn.softmax(logits, axis=-1)
        acc = probs if acc is None else acc + probs
    return np.asarray(jnp.argmax(acc, axis=-1)[0])


def single_gpu_test(model,
                    variables,
                    data_loader,
                    pre_eval: bool = True,
                    format_only: bool = False,
                    out_dir: Optional[str] = None,
                    progress: bool = True,
                    return_states: bool = False,
                    state_proc_cfg: Optional[dict] = None,
                    quant_int8: bool = False,
                    act_scales: Optional[dict] = None,
                    spatial: int = 0):
    """Returns pre_eval tuples (or label maps); with ``return_states``
    also a list of per-image feature-state dicts.

    ``quant_int8``: trace the forward as int8-PTQ convolutions
    (``pfst_tpu/ops/quant.py``) — the MXU s8 mode; the TPU analogue of
    the reference's TensorRT precision lowering
    (``tools/onnx2tensorrt.py:112-128``)."""
    import contextlib
    qctx = contextlib.nullcontext()
    if quant_int8:
        from ..ops.quant import int8_inference
        qctx = int8_inference(act_scales=act_scales)
    with qctx:
        return _single_gpu_test_body(
            model, variables, data_loader, pre_eval, format_only,
            out_dir, progress, return_states, state_proc_cfg, spatial)


def _single_gpu_test_body(model, variables, data_loader, pre_eval,
                          format_only, out_dir, progress,
                          return_states, state_proc_cfg, spatial=0):
    dataset = data_loader.dataset
    infer = make_spatial_inference_fn(model, spatial) if spatial \
        else make_inference_fn(model)
    state_fn = make_state_fn(model, state_proc_cfg) if return_states \
        else None
    state_list: List[Any] = []
    results: List[Any] = []
    logger = get_root_logger()
    t0 = time.time()
    n = len(dataset)

    def fetch(idx):
        """Load sample ``idx`` and start its host->device transfer.

        Explicit ``device_put`` moves bytes ~7x faster than passing
        numpy as execute-arguments on the tunneled TPU (PERF.md "Data
        loading": 428 vs 40-60 MB/s), and calling it one image AHEAD
        overlaps the next transfer + pipeline work with the current
        device compute (dispatch is async; only the np.asarray in
        ``_finalize_views`` blocks). The spatial path places with its
        own sharding, so it transfers inside ``infer`` instead.
        """
        sample = dataset[idx]
        imgs = sample['img']
        metas = sample['img_metas']
        if not isinstance(imgs, list):
            imgs, metas = [imgs], [metas]
        if spatial:
            dev = [jnp.asarray(img)[None] for img in imgs]
        else:
            dev = [jax.device_put(np.asarray(img)[None])
                   for img in imgs]
        return dev, metas

    # deferred-normalize pipelines (DeferNormalize, e.g. tools/test.py
    # --device-normalize) ship uint8/f16 wire images — 4x/2x fewer
    # bytes through the host->device put (PERF.md round 5: the put
    # path ages in long-lived processes); the metas self-describe it,
    # so normalization runs here as one tiny jitted device program.
    # (With --spatial the savings don't apply: normalization happens
    # before the spatially-sharded placement.)
    dev_norm = None

    def _maybe_dev_norm(metas):
        cfgn = (metas[0].get('img_norm_cfg') or {}) \
            if metas else {}
        if not cfgn.get('deferred'):
            return None
        mean = jnp.asarray(np.asarray(cfgn['mean']), jnp.float32)
        std = jnp.asarray(np.asarray(cfgn['std']), jnp.float32)
        return jax.jit(
            lambda im: (im.astype(jnp.float32) - mean) / std)

    nxt = fetch(0) if n else None
    if n:
        dev_norm = _maybe_dev_norm(
            nxt[1] if isinstance(nxt[1], list) else [nxt[1]])
    for idx in range(n):
        dev_imgs, metas = nxt
        ori_shape = metas[0]['ori_shape'][:2]
        metas_l = metas if isinstance(metas, list) else [metas]
        if dev_norm is not None:
            dev_imgs = [dev_norm(img) for img in dev_imgs]
        view_probs = [infer(variables, img) for img in dev_imgs]
        if idx + 1 < n:
            nxt = fetch(idx + 1)
        pred = _finalize_views(model, view_probs, metas_l, ori_shape)
        if state_fn is not None:
            st = state_fn(variables, dev_imgs[0])
            state_list.append(
                {k: np.asarray(v[0]) for k, v in st.items()})
        if pre_eval:
            results.extend(dataset.pre_eval(pred, idx))
        else:
            results.append(pred)
        if progress and (idx + 1) % 50 == 0:
            rate = (idx + 1) / (time.time() - t0)
            print_log(f'eval {idx + 1}/{n} ({rate:.1f} img/s)', logger)
    if return_states:
        return results, state_list
    return results


def multi_gpu_test(model, variables, data_loader, pre_eval=True,
                   format_only: bool = False, progress: bool = True,
                   devices=None, quant_int8: bool = False,
                   act_scales=None, **kwargs):
    """Device-sharded eval (the reference's multi-GPU test,
    ``apis/test.py:194-287``, redesigned mesh-first).

    ``quant_int8``/``act_scales``: as in :func:`single_gpu_test` — the
    interceptor acts at trace time, and every program here is traced
    per call, so the sharded int8 eval needs no other changes.  Note
    the bit-parity promise below is an fp32 property; under int8 the
    dequant multiplies fuse differently per program shape and
    borderline argmax ties may flip (metric-level agreement tested).

    Image views are bucketed by input shape; each full bucket of
    ``n_devices`` views is stacked into one batch, placed with the
    batch dim sharded over a 1-D ``data`` mesh, and run through ONE
    jitted inference call — every device computes its view in
    parallel. Per-image flip-undo/rescale/argmax and the tiny
    (num_classes,) ``pre_eval`` histograms reuse the single-device
    code path, so results are identical to ``single_gpu_test``.

    Unlike the reference there is no tmpdir/NCCL result gather: the
    per-image histograms are tiny host vectors collected directly; a
    cross-host run shards the dataset by ``jax.process_index()`` in
    the loader and gathers host-side.
    """
    if quant_int8:
        from ..ops.quant import int8_inference
        with int8_inference(act_scales=act_scales):
            return multi_gpu_test(model, variables, data_loader,
                                  pre_eval=pre_eval,
                                  format_only=format_only,
                                  progress=progress, devices=devices,
                                  **kwargs)
    if kwargs.get('return_states'):
        # feature-state dumps are a single-device diagnostic path
        return single_gpu_test(model, variables, data_loader,
                               pre_eval=pre_eval,
                               format_only=format_only,
                               progress=progress, **kwargs)
    from ..parallel.mesh import batch_sharding, get_mesh

    dataset = data_loader.dataset
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_dev == 1:
        return single_gpu_test(model, variables, data_loader,
                               pre_eval=pre_eval,
                               format_only=format_only,
                               progress=progress, **kwargs)
    mesh = get_mesh(devices)
    sharding = batch_sharding(mesh)
    infer = make_inference_fn(model)
    logger = get_root_logger()
    n = len(dataset)
    t0 = time.time()

    # On-device pre_eval (SURVEY §5: eval reduction = a psum of
    # (num_classes,) intersect/union histograms): for plain
    # single-view/no-flip images the rescale + argmax + histogram run
    # INSIDE the sharded program and only 4*(num_classes,) vectors per
    # image return to host — instead of full probability maps.
    num_classes = len(dataset.CLASSES) if getattr(
        dataset, 'CLASSES', None) else None
    ignore_index = getattr(dataset, 'ignore_index', 255)
    can_gt = hasattr(dataset, 'get_gt_seg_map_by_idx')

    @jax.jit
    def infer_hist(variables, imgs, gts):
        from ..core.evaluation.metrics import intersect_and_union
        logits = model.apply(variables, imgs,
                             method=model.inference_logits)[0]
        if logits.shape[1:3] != gts.shape[1:3]:
            from ..ops import resize
            # resize LOGITS, argmax after — same order as
            # _finalize_views (softmax is argmax-invariant)
            logits = resize(logits, size=gts.shape[1:3],
                            mode='bilinear',
                            align_corners=model.align_corners)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.vmap(
            lambda p, g: intersect_and_union(
                p, g, num_classes, ignore_index))(pred, gts)

    # Streaming: views are bucketed by input shape and flushed as soon
    # as a bucket holds one view per device; an image finalizes (and
    # its probs free) once all its TTA views have been computed.
    buckets: Dict[tuple, list] = {}        # shape -> [(idx, v, img, meta)]
    probs_by_item: Dict[tuple, Any] = {}   # (idx, v) -> host probs
    metas_by_item: Dict[tuple, dict] = {}
    pending: Dict[int, int] = {}           # idx -> views not yet run
    view_counts: Dict[int, int] = {}
    ori_shapes: Dict[int, tuple] = {}
    result_by_idx: Dict[int, list] = {}
    flushes = 0
    done = 0

    # deferred-normalize pipelines ship uint8/f16 wire images (see
    # single_gpu_test): transfer the narrow batch, then normalize it
    # on-device as one tiny sharded program before inference
    dev_norm = {'fn': None}

    def _wire_norm(batch, meta):
        cfgn = meta.get('img_norm_cfg') or {}
        if not cfgn.get('deferred') or batch.dtype == jnp.float32:
            return batch
        if dev_norm['fn'] is None:
            mean = jnp.asarray(np.asarray(cfgn['mean']), jnp.float32)
            std = jnp.asarray(np.asarray(cfgn['std']), jnp.float32)
            dev_norm['fn'] = jax.jit(
                lambda b: (b.astype(jnp.float32) - mean) / std)
        return dev_norm['fn'](batch)

    def finalize(idx):
        views = [jnp.asarray(probs_by_item.pop((idx, v)))[None]
                 for v in range(view_counts[idx])]
        metas = [metas_by_item.pop((idx, v))
                 for v in range(view_counts[idx])]
        pred = _finalize_views(model, views, metas, ori_shapes[idx])
        result_by_idx[idx] = (dataset.pre_eval(pred, idx) if pre_eval
                              else [pred])
        _progress_tick()

    def flush(bucket):
        nonlocal flushes
        if not bucket:
            return
        pad = (-len(bucket)) % n_dev
        batch_items = bucket + [bucket[-1]] * pad
        batch = np.stack([im for (_, _, im, _, _) in batch_items])
        batch = jax.device_put(jnp.asarray(batch), sharding)
        batch = _wire_norm(batch, batch_items[0][3])
        flushes += 1
        if batch_items[0][4] is not None:
            # histogram path: every item carries its gt
            gts = jax.device_put(
                jnp.asarray(np.stack(
                    [g for (_, _, _, _, g) in batch_items])), sharding)
            hists = [np.asarray(h) for h in
                     infer_hist(variables, batch, gts)]
            for j, (idx, v, _, me, _) in enumerate(bucket):
                result_by_idx[idx] = [tuple(h[j] for h in hists)]
                _progress_tick()
            return
        probs = np.asarray(infer(variables, batch))
        for j, (idx, v, _, me, _) in enumerate(bucket):
            probs_by_item[(idx, v)] = probs[j]
            metas_by_item[(idx, v)] = me
            pending[idx] -= 1
            if pending[idx] == 0:
                finalize(idx)

    def _progress_tick():
        nonlocal done
        done += 1
        if progress and done % 50 == 0:
            rate = done / (time.time() - t0)
            print_log(f'eval {done}/{n} on {n_dev} devices '
                      f'({rate:.1f} img/s)', logger)

    for idx in range(n):
        sample = dataset[idx]
        imgs, metas = sample['img'], sample['img_metas']
        if not isinstance(imgs, list):
            imgs, metas = [imgs], [metas]
        metas = metas if isinstance(metas, list) else [metas]
        ori_shapes[idx] = tuple(metas[0]['ori_shape'][:2])
        view_counts[idx] = pending[idx] = len(imgs)
        # histogram path only for plain single-view no-flip eval
        gt = None
        if (pre_eval and can_gt and num_classes and len(imgs) == 1
                and not metas[0].get('flip', False)):
            gt = np.asarray(dataset.get_gt_seg_map_by_idx(idx),
                            np.int32)
        for v, (im, me) in enumerate(zip(imgs, metas)):
            im = np.asarray(im)
            key = (im.shape, ori_shapes[idx] if gt is not None
                   else None, gt is not None)
            bucket = buckets.setdefault(key, [])
            bucket.append((idx, v, im, me, gt))
            if len(bucket) == n_dev:
                flush(bucket)
                buckets[key] = []
    for bucket in buckets.values():
        flush(bucket)
    multi_gpu_test.last_num_device_batches = flushes

    results: List[Any] = []
    for idx in range(n):
        results.extend(result_by_idx[idx])
    return results
