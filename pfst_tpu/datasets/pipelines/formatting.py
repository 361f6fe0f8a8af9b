"""Formatting transforms (mirror of ``datasets/pipelines/formating.py``).

On TPU the bundle keeps NHWC float32 numpy arrays (no CHW transpose, no
torch tensors); ``Collect`` gathers the meta keys the reference records,
extended by ``rotate_k``/``crop_bbox`` (``formating.py:261-266``).
"""
from __future__ import annotations

import numpy as np

from ..builder import PIPELINES

DEFAULT_META_KEYS = ('filename', 'ori_filename', 'ori_shape', 'img_shape',
                     'pad_shape', 'scale_factor', 'flip',
                     'flip_direction', 'img_norm_cfg', 'rotate_k',
                     'crop_bbox')


@PIPELINES.register_module()
class DefaultFormatBundle:
    """img -> float32 HWC; gt -> int32 HW.

    When normalization is DEFERRED to the device
    (``DeferNormalize``), the bundle must NOT cast images back to
    float32 — the whole point of the deferred path is the narrow
    uint8/float16 wire dtype crossing the host->device link
    (``cfg.data.device_normalize``; PERF.md round 5: the cast here
    silently re-inflated the wire 4x and made the option inert)."""

    def __call__(self, results):
        deferred = bool(results.get('img_norm_cfg',
                                    {}).get('deferred'))

        def fmt(img):
            if img.ndim == 2:
                img = img[..., None]
            return np.ascontiguousarray(
                img, img.dtype if deferred else np.float32)

        for key in results.get('img_fields', ['img']):
            results[key] = fmt(results[key])
        for key in results.get('seg_fields', []):
            results[key] = np.ascontiguousarray(results[key], np.int32)
        if 'ori_img' in results:
            results['ori_img'] = fmt(results['ori_img'])
            # per-sample replay metas as stackable arrays so the
            # collated batch carries them to PFSTV4's in-step
            # transform_by_metas (rot90/flip only — see KeepOriImage)
            results['rotate_k'] = np.asarray(
                results.get('rotate_k', 0), np.int32)
            flip = bool(results.get('flip', False))
            direction = results.get('flip_direction') or 'horizontal'
            results['flip_horizontal'] = np.asarray(
                int(flip and 'horizontal' in direction), np.int32)
            results['flip_vertical'] = np.asarray(
                int(flip and 'vertical' in direction), np.int32)
        return results

    def __repr__(self):
        return self.__class__.__name__


@PIPELINES.register_module()
class ImageToTensor:

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        # like DefaultFormatBundle: a deferred-normalize pipeline
        # ships its narrow wire dtype through untouched
        deferred = bool(results.get('img_norm_cfg',
                                    {}).get('deferred'))
        for key in self.keys:
            img = results[key]
            if img.ndim == 2:
                img = img[..., None]
            results[key] = np.ascontiguousarray(
                img, img.dtype if deferred else np.float32)
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(keys={self.keys})'


@PIPELINES.register_module()
class Collect:
    """(``formating.py:224``) keep data keys + pack metas."""

    def __init__(self, keys, meta_keys=DEFAULT_META_KEYS):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        data = {}
        img_meta = {k: results[k] for k in self.meta_keys if k in results}
        data['img_metas'] = img_meta
        for key in self.keys:
            data[key] = results[key]
        return data

    def __repr__(self):
        return (f'{self.__class__.__name__}(keys={self.keys}, '
                f'meta_keys={self.meta_keys})')
