"""Loading transforms.

Mirrors ``rsiseg/datasets/pipelines/loading.py``: image/annotation
readers plus the pseudo-label loaders that consume the offline
pseudo-label generator's h5 dumps (``loading.py:393-525``).
"""
from __future__ import annotations

import os
import os.path as osp

import cv2
import numpy as np

from ..builder import PIPELINES


class _DecodeCache:
    """Process-wide LRU cache of decoded tiles.

    PNG decode dominates the per-sample pipeline cost (~26 ms of a
    ~55-75 ms sample on 1024^2 tiles — see PERF.md "data loading");
    UDA training revisits every tile each epoch, so caching the
    *decoded* uint8 array removes the whole decode on hits.  Arrays
    are stored read-only: every downstream transform already produces
    fresh arrays (resize/rot90/flip/astype all copy), and an
    accidental in-place write raises instead of corrupting the cache.

    The reference has no equivalent (its torch DataLoader re-decodes
    every epoch, `/root/reference/rsiseg/datasets/pipelines/
    loading.py:15`); this is framework headroom, not parity.
    """

    def __init__(self, budget_bytes: int):
        import threading
        from collections import OrderedDict
        self._lock = threading.Lock()
        self._items = OrderedDict()
        self._bytes = 0
        self.budget = budget_bytes
        self.hits = self.misses = 0

    def get(self, key):
        with self._lock:
            arr = self._items.get(key)
            if arr is not None:
                self._items.move_to_end(key)
                self.hits += 1
            else:
                self.misses += 1
            return arr

    def put(self, key, arr):
        if arr.nbytes > self.budget:
            return
        arr.setflags(write=False)
        with self._lock:
            if key in self._items:
                return
            self._items[key] = arr
            self._bytes += arr.nbytes
            while self._bytes > self.budget:
                _, old = self._items.popitem(last=False)
                self._bytes -= old.nbytes


_decode_cache = None


def set_decode_cache_mb(mb: float) -> None:
    """Enable (mb > 0) or disable (0) the decoded-tile LRU cache.
    Config surface: ``cfg.data.decode_cache_mb``; env default:
    ``PFST_DECODE_CACHE_MB``."""
    global _decode_cache
    _decode_cache = _DecodeCache(int(mb * 2 ** 20)) if mb > 0 else None


if os.environ.get('PFST_DECODE_CACHE_MB'):
    set_decode_cache_mb(float(os.environ['PFST_DECODE_CACHE_MB']))


def imread(path: str, color: bool = True, unchanged: bool = False):
    """cv2 read keeping mmcv's BGR convention for color images.

    Directories packed by ``tools/pack_dataset.py`` are served from
    the mmap blob (no decode, shared page cache across workers); see
    ``pipelines/packing.py``."""
    from . import packing
    packed = packing.lookup(path, color, unchanged)
    if packed is not None:
        return packed
    cache, key = _decode_cache, (path, color, unchanged)
    if cache is not None:
        img = cache.get(key)
        if img is not None:
            return img
    if unchanged:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    elif color:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
    else:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(f'failed to read image: {path}')
    if cache is not None:
        cache.put(key, img)
    return img


@PIPELINES.register_module()
class LoadImageFromFile:
    """(``loading.py:15``) loads BGR uint8 (or as-is for TIFF)."""

    def __init__(self, to_float32=False, color_type='color',
                 imdecode_backend='cv2'):
        self.to_float32 = to_float32
        self.color_type = color_type

    def __call__(self, results):
        if results.get('img_prefix') is not None:
            filename = osp.join(results['img_prefix'],
                                results['img_info']['filename'])
        else:
            filename = results['img_info']['filename']
        img = imread(filename, unchanged=self.color_type == 'unchanged')
        if self.to_float32:
            img = img.astype(np.float32)
        results['filename'] = filename
        results['ori_filename'] = results['img_info']['filename']
        results['img'] = img
        results['img_shape'] = img.shape
        results['ori_shape'] = img.shape
        results['pad_shape'] = img.shape
        results['scale_factor'] = 1.0
        num_channels = 1 if len(img.shape) < 3 else img.shape[2]
        results['img_norm_cfg'] = dict(
            mean=np.zeros(num_channels, dtype=np.float32),
            std=np.ones(num_channels, dtype=np.float32),
            to_rgb=False)
        results['img_fields'] = ['img']
        results.setdefault('seg_fields', [])
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(to_float32={self.to_float32})'


@PIPELINES.register_module()
class LoadAnnotations:
    """(``loading.py:101``) loads the label map, applies label_map and
    reduce_zero_label (0->255, x->x-1)."""

    def __init__(self, reduce_zero_label=False, imdecode_backend=None):
        self.reduce_zero_label = reduce_zero_label

    def __call__(self, results):
        if results.get('seg_prefix', None) is not None:
            filename = osp.join(results['seg_prefix'],
                                results['ann_info']['seg_map'])
        else:
            filename = results['ann_info']['seg_map']
        gt = imread(filename, unchanged=True)
        if gt.ndim == 3:
            gt = gt[..., 0]
        gt = gt.astype(np.uint8)
        if results.get('label_map', None) is not None:
            out = gt.copy()
            for old_id, new_id in results['label_map'].items():
                out[gt == old_id] = new_id
            gt = out
        if self.reduce_zero_label:
            gt[gt == 0] = 255
            gt = gt - 1
            gt[gt == 254] = 255
        results['gt_semantic_seg'] = gt
        results['seg_fields'].append('gt_semantic_seg')
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}'
                f'(reduce_zero_label={self.reduce_zero_label})')


@PIPELINES.register_module()
class LoadAnnotationsPseudoLabelsV2(LoadAnnotations):
    """Target-domain pseudo-label loader (``loading.py:393-525``).

    With ``pseudo_labels_dir=None`` (all shipped configs) it emits an
    all-255 dummy label so the target branch has the same keys as the
    source branch.  With a directory set, per-image h5 files written by
    the offline pseudo-label generator (``tools/gen_pseudo_labels.py``)
    are read: stored logits -> softmax -> per-class entropy thresholding
    at the requested ``pseudo_ratio`` -> labels with 255 elsewhere.
    """

    def __init__(self, pseudo_labels_dir=None, pseudo_ratio=0.0,
                 load_feats=False, reduce_zero_label=False,
                 sim_feat_names=('gaussian_sim_feat_2',), **kwargs):
        super().__init__(reduce_zero_label=reduce_zero_label)
        self.pseudo_labels_dir = pseudo_labels_dir
        self.pseudo_ratio = pseudo_ratio
        self.load_feats = load_feats
        self.sim_feat_names = list(sim_feat_names)

    def __call__(self, results):
        h, w = results['img'].shape[:2]
        if self.pseudo_labels_dir is None:
            gt = np.full((h, w), 255, np.uint8)
            results['gt_semantic_seg'] = gt
            results['seg_fields'].append('gt_semantic_seg')
            return results
        import h5py
        name = osp.splitext(osp.basename(results['filename']))[0]
        path = osp.join(self.pseudo_labels_dir, f'{name}.h5')
        with h5py.File(path, 'r') as f:
            logits = np.asarray(f['seg_logits'], np.float32)  # (C,H,W)
            thre_key = f'thre@{self.pseudo_ratio}'
            thresholds = np.asarray(f[thre_key], np.float32) \
                if thre_key in f else None
            if self.load_feats:
                # precomputed sim maps for FMDAAdaptor's loss_sim_feat
                # (reference ``loading.py:497-503``); stored (h,w,k2)
                for key in self.sim_feat_names:
                    if key in f:
                        results[key] = np.asarray(f[key], np.float32)
        e = np.exp(logits - logits.max(0, keepdims=True))
        prob = e / e.sum(0, keepdims=True)
        label = prob.argmax(0).astype(np.uint8)
        if thresholds is not None:
            entropy = -(prob * np.log(prob + 1e-12)).sum(0)
            keep = entropy <= thresholds[label]
            label = np.where(keep, label, 255).astype(np.uint8)
        if label.shape != (h, w):
            label = cv2.resize(label, (w, h),
                               interpolation=cv2.INTER_NEAREST)
        results['gt_semantic_seg'] = label
        results['seg_fields'].append('gt_semantic_seg')
        return results


@PIPELINES.register_module()
class LoadAnnotationsPseudoLabels(LoadAnnotationsPseudoLabelsV2):
    """V1 loader (``loading.py:310``) — same public behavior."""


@PIPELINES.register_module()
class AnnotationMapperInria:
    """Inria building labels 255 -> 1 (``loading.py:172``)."""

    def __call__(self, results):
        gt = results['gt_semantic_seg']
        gt = (gt > 127).astype(np.uint8)
        results['gt_semantic_seg'] = gt
        return results


@PIPELINES.register_module()
class LoadAnnotationsGTA:
    """Depth-map annotation loader (``loading.py:181-236``): reads the
    seg_map file as a float map, divides by 100, clips to [0, 500] and
    zeroes NaNs — used for GTA-style height regression experiments."""

    def __init__(self, reduce_zero_label=False, file_client_args=None,
                 imdecode_backend=None):
        self.reduce_zero_label = reduce_zero_label

    def __call__(self, results):
        if results.get('seg_prefix', None) is not None:
            filename = osp.join(results['seg_prefix'],
                                results['ann_info']['seg_map'])
        else:
            filename = results['ann_info']['seg_map']
        gt = imread(filename, unchanged=True).astype(np.float32) / 100.
        gt = np.clip(gt, 0, 500)
        gt = np.nan_to_num(gt, nan=0.0)
        results['gt_semantic_seg'] = gt
        results['seg_fields'].append('gt_semantic_seg')
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}'
                f'(reduce_zero_label={self.reduce_zero_label})')


@PIPELINES.register_module()
class LoadAnnotationsDepth:
    """AGL (above-ground-level) depth loader (``loading.py:241-306``):
    swaps ``RGB``->``AGL`` in the seg_map path, zeroes values > 400 and
    clips to [0, 400]."""

    def __init__(self, reduce_zero_label=False, file_client_args=None,
                 imdecode_backend=None):
        self.reduce_zero_label = reduce_zero_label

    def __call__(self, results):
        if results.get('seg_prefix', None) is not None:
            filename = osp.join(results['seg_prefix'],
                                results['ann_info']['seg_map'])
        else:
            filename = results['ann_info']['seg_map']
        filename = filename.replace('RGB', 'AGL')
        gt = imread(filename, unchanged=True).astype(np.float32)
        gt[gt > 400] = 0
        gt = np.clip(gt, 0, 400)
        results['gt_semantic_seg'] = gt
        results['seg_fields'].append('gt_semantic_seg')
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}'
                f'(reduce_zero_label={self.reduce_zero_label})')
