"""Host-side geometric/photometric transforms (numpy + cv2).

Mirrors ``rsiseg/datasets/pipelines/transforms.py`` and ``rsi_aug.py``:
the training pipeline runs on CPU feeder threads producing static-shape
512^2 patches; everything that benefits from the TPU (ClassMix, jitter,
blur of the UDA step) lives in ``models/utils/dacs_transforms.py``
instead.

Semantics preserved: Resize ratio_range jitter + keep_ratio rescale,
RandomCrop ``cat_max_ratio`` re-crop (<=75% single class, 10 attempts,
records ``crop_bbox``), RandomFlip recording direction, RandomRotate90
recording ``rotate_k``, Pad to static size with seg_pad_val=255,
PhotoMetricDistortion ranges/order, StrongAugmentation writing a second
``img_strong_aug`` view, ClipNormalize mean±2std clipping for uint16
imagery (SeasonNet).
"""
from __future__ import annotations

import os

import cv2
import numpy as np

from ..builder import PIPELINES


def imresize(img, size_wh, interpolation='bilinear'):
    inter = {'bilinear': cv2.INTER_LINEAR, 'nearest': cv2.INTER_NEAREST,
             'bicubic': cv2.INTER_CUBIC}[interpolation]
    return cv2.resize(img, size_wh, interpolation=inter)


def imrescale(img, scale, interpolation='bilinear'):
    """Resize keeping aspect so the image fits within ``scale`` (max
    long/short edge rule of mmcv.imrescale)."""
    h, w = img.shape[:2]
    if isinstance(scale, (int, float)):
        factor = scale
    else:
        max_long, max_short = max(scale), min(scale)
        factor = min(max_long / max(h, w), max_short / min(h, w))
    new_size = (int(w * factor + 0.5), int(h * factor + 0.5))
    return imresize(img, new_size, interpolation), factor


@PIPELINES.register_module()
class Resize:
    """(``transforms.py:12``) multi-scale resize with ratio jitter."""

    def __init__(self, img_scale=None, multiscale_mode='range',
                 ratio_range=None, keep_ratio=True,
                 min_size=None, override_scale=False):
        if img_scale is None:
            self.img_scale = None
        elif isinstance(img_scale, list):
            self.img_scale = [tuple(s) for s in img_scale]
        else:
            self.img_scale = [tuple(img_scale)]
        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio
        self.min_size = min_size
        self.override_scale = override_scale

    def _random_scale(self, results):
        if self.ratio_range is not None:
            if self.img_scale is None:
                h, w = results['img'].shape[:2]
                base = (w, h)
            else:
                base = self.img_scale[0]
            lo, hi = self.ratio_range
            ratio = np.random.random_sample() * (hi - lo) + lo
            scale = (int(base[0] * ratio), int(base[1] * ratio))
        elif len(self.img_scale) == 1:
            scale = self.img_scale[0]
        elif self.multiscale_mode == 'range':
            long_edges = [max(s) for s in self.img_scale]
            short_edges = [min(s) for s in self.img_scale]
            long_e = np.random.randint(min(long_edges),
                                       max(long_edges) + 1)
            short_e = np.random.randint(min(short_edges),
                                        max(short_edges) + 1)
            scale = (long_e, short_e)
        else:  # 'value'
            scale = self.img_scale[np.random.randint(len(self.img_scale))]
        results['scale'] = scale

    def __call__(self, results):
        if 'scale' not in results and \
                isinstance(results.get('scale_factor'), (int, float)):
            # ratio-mode TTA (``MultiScaleFlipAug(img_scale=None,
            # img_ratios=...)``): derive the pixel scale from the
            # image shape like mmseg's Resize scale_factor path
            h, w = results['img'].shape[:2]
            sf = float(results['scale_factor'])
            results['scale'] = (int(w * sf), int(h * sf))
        if 'scale' not in results or self.override_scale:
            self._random_scale(results)
        img = results['img']
        if self.keep_ratio:
            img, factor = imrescale(img, results['scale'])
            scale_factor = np.array([factor, factor, factor, factor],
                                    np.float32)
        else:
            wq, hq = results['scale']
            h, w = img.shape[:2]
            img = imresize(img, (wq, hq))
            scale_factor = np.array([wq / w, hq / h, wq / w, hq / h],
                                    np.float32)
        results['img'] = img
        results['img_shape'] = img.shape
        results['pad_shape'] = img.shape
        results['scale_factor'] = scale_factor
        results['keep_ratio'] = self.keep_ratio
        size_wh = (img.shape[1], img.shape[0])
        for key in results.get('seg_fields', []):
            results[key] = imresize(results[key], size_wh, 'nearest')
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(img_scale={self.img_scale}, '
                f'ratio_range={self.ratio_range}, '
                f'keep_ratio={self.keep_ratio})')


@PIPELINES.register_module()
class RandomCrop:
    """(``transforms.py:645-737``) crop with single-class cap."""

    def __init__(self, crop_size, cat_max_ratio=1.0, ignore_index=255):
        assert crop_size[0] > 0 and crop_size[1] > 0
        self.crop_size = tuple(crop_size)
        self.cat_max_ratio = cat_max_ratio
        self.ignore_index = ignore_index

    def get_crop_bbox(self, img):
        margin_h = max(img.shape[0] - self.crop_size[0], 0)
        margin_w = max(img.shape[1] - self.crop_size[1], 0)
        offset_h = np.random.randint(0, margin_h + 1)
        offset_w = np.random.randint(0, margin_w + 1)
        return (offset_h, offset_h + self.crop_size[0],
                offset_w, offset_w + self.crop_size[1])

    @staticmethod
    def crop(img, bbox):
        y1, y2, x1, x2 = bbox
        return img[y1:y2, x1:x2, ...]

    def __call__(self, results):
        img = results['img']
        crop_bbox = self.get_crop_bbox(img)
        if self.cat_max_ratio < 1.0 and 'gt_semantic_seg' in results:
            for _ in range(10):
                seg = self.crop(results['gt_semantic_seg'], crop_bbox)
                if seg.dtype == np.uint8:
                    # O(n) class histogram — same decision as
                    # np.unique but ~6x cheaper on 512^2 crops (the
                    # target pipeline runs all 10 retries when the
                    # label is all-ignore)
                    cnt = np.bincount(seg.reshape(-1), minlength=256)
                    if 0 <= self.ignore_index < 256:
                        cnt[self.ignore_index] = 0
                    cnt = cnt[cnt > 0]
                else:
                    labels, cnt = np.unique(seg, return_counts=True)
                    cnt = cnt[labels != self.ignore_index]
                if len(cnt) > 1 and \
                        cnt.max() / cnt.sum() < self.cat_max_ratio:
                    break
                crop_bbox = self.get_crop_bbox(img)
        results['img'] = self.crop(img, crop_bbox)
        results['img_shape'] = results['img'].shape
        results['crop_bbox'] = crop_bbox
        for key in results.get('seg_fields', []):
            results[key] = self.crop(results[key], crop_bbox)
        for key in results.get('img_fields', []):
            if key != 'img':
                results[key] = self.crop(results[key], crop_bbox)
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(crop_size={self.crop_size})'


@PIPELINES.register_module()
class RandomFlip:
    """(``transforms.py:263``) records flip + direction."""

    def __init__(self, prob=None, flip_ratio=None,
                 direction='horizontal'):
        self.prob = prob if prob is not None else flip_ratio
        assert direction in ('horizontal', 'vertical')
        self.direction = direction

    def __call__(self, results):
        if 'flip' not in results or True:
            flip = np.random.rand() < (self.prob or 0)
        if flip:
            axis = 1 if self.direction == 'horizontal' else 0
            for key in results.get('img_fields', ['img']):
                results[key] = np.flip(results[key], axis=axis).copy()
            for key in results.get('seg_fields', []):
                results[key] = np.flip(results[key], axis=axis).copy()
        # accumulate directions like consecutive RandomFlips in the
        # reference pipelines (vertical then horizontal)
        prev = results.get('flip_direction')
        if flip:
            if isinstance(prev, list):
                prev = prev + [self.direction]
            elif isinstance(prev, str):
                prev = [prev, self.direction]
            else:
                prev = self.direction
        results['flip'] = bool(results.get('flip', False) or flip)
        results['flip_direction'] = prev
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(prob={self.prob}, '
                f'direction={self.direction})')


@PIPELINES.register_module()
class RandomRotate90:
    """(``rsi_aug.py:30``) rotate by k*90 degrees, records ``rotate_k``."""

    def __init__(self, prob=1.0):
        self.prob = prob

    def __call__(self, results):
        rot_k = 0
        if np.random.rand() < self.prob:
            rot_k = int(np.random.choice([0, 1, 2, 3]))
            if rot_k:
                for key in results.get('img_fields', ['img']):
                    results[key] = np.ascontiguousarray(
                        np.rot90(results[key], k=rot_k))
                for key in results.get('seg_fields', []):
                    results[key] = np.ascontiguousarray(
                        np.rot90(results[key], k=rot_k))
                results['img_shape'] = results['img'].shape
        results['rotate_k'] = rot_k
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(prob={self.prob})'


@PIPELINES.register_module()
class RandomRotate:
    """(``transforms.py``) arbitrary-angle rotation."""

    def __init__(self, prob, degree, pad_val=0, seg_pad_val=255,
                 center=None, auto_bound=False):
        self.prob = prob
        self.degree = (-degree, degree) if isinstance(
            degree, (int, float)) else tuple(degree)
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val
        self.center = center
        self.auto_bound = auto_bound

    def __call__(self, results):
        if np.random.rand() < self.prob:
            angle = np.random.uniform(*self.degree)
            h, w = results['img'].shape[:2]
            center = self.center or ((w - 1) * 0.5, (h - 1) * 0.5)
            m = cv2.getRotationMatrix2D(center, -angle, 1.0)
            results['img'] = cv2.warpAffine(
                results['img'], m, (w, h), flags=cv2.INTER_LINEAR,
                borderValue=self.pad_val)
            for key in results.get('seg_fields', []):
                results[key] = cv2.warpAffine(
                    results[key], m, (w, h), flags=cv2.INTER_NEAREST,
                    borderValue=self.seg_pad_val)
        return results


@PIPELINES.register_module()
class Pad:
    """(``transforms.py:332``) bottom/right pad to static size."""

    def __init__(self, size=None, size_divisor=None, pad_val=0,
                 seg_pad_val=255):
        self.size = tuple(size) if size is not None else None
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        self.seg_pad_val = seg_pad_val

    def _pad(self, img, target, val):
        ph = max(target[0] - img.shape[0], 0)
        pw = max(target[1] - img.shape[1], 0)
        pad_width = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
        return np.pad(img, pad_width, constant_values=val)

    def __call__(self, results):
        if self.size is not None:
            target = self.size
        else:
            d = self.size_divisor
            h, w = results['img'].shape[:2]
            target = (-(-h // d) * d, -(-w // d) * d)
        for key in results.get('img_fields', ['img']):
            results[key] = self._pad(results[key], target, self.pad_val)
        # the clean snapshot sits outside img_fields so geometric
        # transforms skip it, but it must stay shape-aligned with img
        # (reference keeps ori_img full-size instead: loading.py:74)
        if 'ori_img' in results:
            results['ori_img'] = self._pad(results['ori_img'], target,
                                           self.pad_val)
        for key in results.get('seg_fields', []):
            results[key] = self._pad(results[key], target,
                                     self.seg_pad_val)
        results['pad_shape'] = results['img'].shape
        results['pad_fixed_size'] = self.size
        results['pad_size_divisor'] = self.size_divisor
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}(size={self.size})'


@PIPELINES.register_module()
class Normalize:
    """(``transforms.py:405``) (x - mean)/std, optional BGR->RGB."""

    def __init__(self, mean, std, to_rgb=True):
        self.mean = np.array(mean, np.float32)
        self.std = np.array(std, np.float32)
        self.to_rgb = to_rgb

    def _norm(self, img):
        img = img.astype(np.float32)
        if self.to_rgb and img.ndim == 3 and img.shape[2] == 3:
            img = img[..., ::-1]
        return (img - self.mean) / self.std

    def __call__(self, results):
        for key in results.get('img_fields', ['img']):
            results[key] = self._norm(results[key])
        # reference normalizes the clean snapshot explicitly
        # (transforms.py:437-439)
        if 'ori_img' in results:
            results['ori_img'] = self._norm(results['ori_img'])
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results

    def __repr__(self):
        return (f'{self.__class__.__name__}(mean={self.mean.tolist()}, '
                f'std={self.std.tolist()}, to_rgb={self.to_rgb})')


@PIPELINES.register_module()
class DeferNormalize:
    """Normalize-on-DEVICE: ship images over the host->device link in
    the 0-255 domain as float16 (or uint8) and let the jitted train
    step apply (x - mean)/std.

    Drop-in replacement for ``Normalize`` in a train pipeline (same
    cfg surface; ``cfg.data.device_normalize = True`` swaps it in
    automatically — see ``apis/train.py``). Halves (fp16) or quarters
    (uint8, lossy for float augmentations) the per-iteration image
    transfer bytes; on bandwidth-starved links (tunneled chips, thin
    PCIe) that is the train-loop bottleneck — see PERF.md.

    The BGR->RGB flip still happens host-side. Pad values: shipped
    configs pad crops to the crop size itself (no-op); a real pad
    would land at -mean/std instead of 0 after device normalization,
    so the auto-swap refuses pipelines whose Pad size differs from
    the crop size.
    """

    def __init__(self, mean, std, to_rgb=True, wire_dtype='float16'):
        self.mean = np.array(mean, np.float32)
        self.std = np.array(std, np.float32)
        self.to_rgb = to_rgb
        assert wire_dtype in ('float16', 'uint8'), wire_dtype
        self.wire_dtype = wire_dtype

    def _prep(self, img):
        if self.to_rgb and img.ndim == 3 and img.shape[2] == 3:
            img = img[..., ::-1]
        if self.wire_dtype == 'uint8':
            return np.clip(np.round(img), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(img, np.float16)

    def __call__(self, results):
        for key in results.get('img_fields', ['img']):
            results[key] = self._prep(results[key])
        if 'ori_img' in results:
            results['ori_img'] = self._prep(results['ori_img'])
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb,
                                       deferred=True)
        return results

    @staticmethod
    def swap_into(node, wire='uint8'):
        """Recursively swap the first ``Normalize`` in a pipeline cfg
        tree for ``DeferNormalize`` (deploy/test configs nest it
        inside ``MultiScaleFlipAug.transforms``).  Returns the swapped
        transform dict, or ``None`` when the tree has no Normalize
        (e.g. EO ``ClipNormalize`` pipelines)."""
        if isinstance(node, dict):
            if node.get('type') == 'Normalize':
                node['type'] = 'DeferNormalize'
                node['wire_dtype'] = wire
                return node
            for v in node.values():
                found = DeferNormalize.swap_into(v, wire)
                if found is not None:
                    return found
        elif isinstance(node, (list, tuple)):
            for v in node:
                found = DeferNormalize.swap_into(v, wire)
                if found is not None:
                    return found
        return None

    def __repr__(self):
        return (f'{self.__class__.__name__}(mean={self.mean.tolist()},'
                f' std={self.std.tolist()}, to_rgb={self.to_rgb}, '
                f'wire_dtype={self.wire_dtype})')


@PIPELINES.register_module()
class ClipNormalize:
    """mean±2std clip to [0,1] (optionally uint8 0-255) for uint16 TIFF
    (``transforms.py:1166-1212``, SeasonNet)."""

    def __init__(self, mean, std, to_rgb=True, axis=None, to_uint8=False):
        self.mean = np.array(mean, np.float32)
        self.std = np.array(std, np.float32)
        self.to_rgb = to_rgb
        self.to_uint8 = to_uint8

    def __call__(self, results):
        lo = self.mean.reshape(1, 1, -1) - 2 * self.std.reshape(1, 1, -1)
        hi = self.mean.reshape(1, 1, -1) + 2 * self.std.reshape(1, 1, -1)
        for key in results.get('img_fields', ['img']):
            img = results[key].astype(np.float32)
            img = np.clip((img - lo) / (hi - lo), 0, 1)
            if self.to_rgb and img.ndim == 3 and img.shape[2] == 3:
                img = img[:, :, [2, 1, 0]]
            if self.to_uint8:
                img = (img * 255).astype(np.uint8)
            results[key] = img
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module()
class PercentileNormalize:
    """per-image percentile stretch (``transforms.py:454``)."""

    def __init__(self, lo=2, hi=98, to_rgb=False):
        self.lo, self.hi, self.to_rgb = lo, hi, to_rgb

    def __call__(self, results):
        for key in results.get('img_fields', ['img']):
            img = results[key].astype(np.float32)
            plo = np.percentile(img, self.lo, axis=(0, 1))
            phi = np.percentile(img, self.hi, axis=(0, 1))
            img = np.clip((img - plo) / np.maximum(phi - plo, 1e-6), 0, 1)
            results[key] = img * 2.0 - 1.0
        return results


@PIPELINES.register_module()
class MultiDomainClipNormalize:
    """per-domain clip-normalize dispatch (``transforms.py:501``)."""

    def __init__(self, norm_cfg_dict, default=None):
        self.norm_cfg_dict = {
            k: ClipNormalize(**v) for k, v in norm_cfg_dict.items()}
        self.default = default

    def __call__(self, results):
        domain = results.get('domain', self.default)
        return self.norm_cfg_dict[domain](results)


@PIPELINES.register_module()
class Rerange:
    """linear rescale to [min, max] (stock mmseg)."""

    def __init__(self, min_value=0, max_value=255):
        self.min_value, self.max_value = min_value, max_value

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-6)
        results['img'] = img * (self.max_value - self.min_value) + \
            self.min_value
        return results


@PIPELINES.register_module()
class CLAHE:
    """contrast-limited adaptive hist equalisation (stock mmseg)."""

    def __init__(self, clip_limit=40.0, tile_grid_size=(8, 8)):
        self.clahe = cv2.createCLAHE(clip_limit, tuple(tile_grid_size))

    def __call__(self, results):
        img = results['img']
        for c in range(img.shape[2]):
            img[:, :, c] = self.clahe.apply(
                np.array(img[:, :, c], np.uint8))
        results['img'] = img
        return results


@PIPELINES.register_module()
class RGB2Gray:

    def __init__(self, out_channels=None, weights=(0.299, 0.587, 0.114)):
        self.out_channels = out_channels
        self.weights = np.array(weights, np.float32)

    def __call__(self, results):
        img = results['img']
        gray = (img[..., :3].astype(np.float32) *
                self.weights).sum(-1, keepdims=True)
        reps = self.out_channels or img.shape[2]
        results['img'] = np.tile(gray, (1, 1, reps))
        results['img_shape'] = results['img'].shape
        return results


@PIPELINES.register_module()
class AdjustGamma:

    def __init__(self, gamma=1.0):
        self.gamma = gamma
        inv = 1.0 / gamma
        self.table = np.array([(i / 255.0)**inv * 255
                               for i in range(256)]).astype(np.uint8)

    def __call__(self, results):
        results['img'] = cv2.LUT(
            np.array(results['img'], np.uint8), self.table)
        return results


@PIPELINES.register_module()
class SegRescale:

    def __init__(self, scale_factor=1):
        self.scale_factor = scale_factor

    def __call__(self, results):
        for key in results.get('seg_fields', []):
            if self.scale_factor != 1:
                seg = results[key]
                h, w = seg.shape[:2]
                results[key] = imresize(
                    seg, (int(w * self.scale_factor),
                          int(h * self.scale_factor)), 'nearest')
        return results


@PIPELINES.register_module()
class Uint82Float:
    """(``transforms.py:1215``)."""

    def __call__(self, results):
        for key in results.get('img_fields', ['img']):
            results[key] = results[key].astype(np.float32)
        return results


class _Photometric:
    """shared photometric ops on BGR uint8 (``transforms.py:943``).

    Each affine step (brightness beta, contrast alpha, saturation
    alpha) is ``clip(float32(x)*a + b, 0, 255).astype(uint8)`` — a
    pointwise uint8->uint8 map, so it is applied as a 256-entry LUT.
    Consecutive BGR-space LUTs compose into ONE table lookup
    (``lut2[lut1]`` reproduces both quantization steps bit-exactly),
    cutting the former 2-4 full-image float32 passes to at most one
    uint8 gather per color-space segment.  RNG draw order is
    unchanged, so streams match the float implementation exactly.
    """

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    _IOTA = np.arange(256, dtype=np.uint8)

    @staticmethod
    def convert(img, alpha=1, beta=0):
        lut = np.clip(
            np.arange(256, dtype=np.float32) * alpha + beta,
            0, 255).astype(np.uint8)
        return _apply_lut(img, lut)

    @staticmethod
    def _affine_lut(lut, alpha=1.0, beta=0.0):
        """Compose ``clip(x*alpha+beta)`` after an existing LUT."""
        step = np.clip(np.arange(256, dtype=np.float32) * alpha + beta,
                       0, 255).astype(np.uint8)
        return step[lut]

    def _apply(self, img):
        lut = self._IOTA
        if np.random.randint(2):
            lut = self._affine_lut(
                lut, beta=np.random.uniform(-self.brightness_delta,
                                            self.brightness_delta))
        mode = np.random.randint(2)
        if mode == 1:
            if np.random.randint(2):
                lut = self._affine_lut(
                    lut, alpha=np.random.uniform(self.contrast_lower,
                                                 self.contrast_upper))
        if lut is not self._IOTA:
            img = _apply_lut(img, lut)
        if np.random.randint(2):
            sat_lut = self._affine_lut(
                self._IOTA,
                alpha=np.random.uniform(self.saturation_lower,
                                        self.saturation_upper))
            img = _hsv_modify(img, sat_lut=sat_lut)
        if np.random.randint(2):
            delta = np.random.randint(-self.hue_delta, self.hue_delta)
            hue_lut = ((np.arange(256) + delta) % 180).astype(np.uint8)
            img = _hsv_modify(img, hue_lut=hue_lut)
        if mode == 0:
            if np.random.randint(2):
                lut = self._affine_lut(
                    self._IOTA,
                    alpha=np.random.uniform(self.contrast_lower,
                                            self.contrast_upper))
                img = _apply_lut(img, lut)
        return img


def _apply_lut(img, lut):
    """256-entry LUT over a uint8 image; cv2.LUT is ~7x faster than a
    numpy fancy-index gather here (SIMD)."""
    img = np.ascontiguousarray(img, np.uint8)
    return cv2.LUT(img, lut)


def _hsv_modify(img, sat_lut=None, hue_lut=None):
    """BGR -> HSV -> per-channel LUT -> BGR, one round-trip.

    Default path: cv2 conversions + ONE 3-channel ``cv2.LUT`` pass
    (both SIMD) — measured fastest on this host (~1.5 ms vs 2.5 ms
    for per-channel numpy gathers and 4.3 ms for the scalar native
    kernel at 512^2; see PERF.md "host augmentation").  The fused C++
    kernel (``pfst_tpu/native/hostaug``, opt-in via
    ``PFST_NATIVE_HSV=1``) replicates cv2's uint8 HSV arithmetic
    bit-exactly for widths that are multiples of 32 — all shipped
    crop sizes; ``tests/test_native_hostaug.py`` documents cv2's own
    SIMD-vs-scalar-tail inconsistency on other widths.
    """
    if os.environ.get('PFST_NATIVE_HSV') == '1':
        from ...native import hostaug
        if hostaug.available():
            return hostaug.hsv_modify(img, sat_lut, hue_lut)
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    lut3 = np.empty((1, 256, 3), np.uint8)
    lut3[0, :, 0] = hue_lut if hue_lut is not None else _Photometric._IOTA
    lut3[0, :, 1] = sat_lut if sat_lut is not None else _Photometric._IOTA
    lut3[0, :, 2] = _Photometric._IOTA
    return cv2.cvtColor(cv2.LUT(hsv, lut3), cv2.COLOR_HSV2BGR)


@PIPELINES.register_module()
class PhotoMetricDistortion(_Photometric):
    """(``transforms.py:943-1060``)."""

    def __call__(self, results):
        results['img'] = self._apply(results['img'])
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}()'


@PIPELINES.register_module()
class KeepOriImage:
    """Snapshot the clean target view for PFSTV4-style teacher replay.

    The reference stashes the *full original* image at load time
    (``loading.py:74``) and replays resize+crop+rot+flip onto teacher
    outputs (``pfst_v4.py:254-259``).  TPU-natively the teacher runs at
    the crop resolution inside the jitted step, so the snapshot is
    taken *after* the geometric resize/crop but *before* rot90/flip
    and photometric distortion: only rot/flip need in-step replay
    (``pfst_tpu/models/utils/pfst_transforms.py``) and every tensor
    keeps a static crop-sized shape.

    Place after ``RandomCrop``, before ``RandomRotate90``/
    ``RandomFlip``/``StrongAugmentation``.  The snapshot stays outside
    ``img_fields`` so later geometric transforms skip it; ``Normalize``
    and ``Pad`` special-case it.  ``UDADataset`` forwards it to the
    batch as ``target_img_ori``.

    Caveat: exact replay requires the resized image to cover the crop
    (no Pad fill) — when Pad actually pads, img is padded *after*
    rot/flip but the snapshot is not rotated, so the fill corners
    differ.  Keep ``ratio_range``'s floor >= crop/img_scale (true of
    every shipped 512^2 pipeline).
    """

    def __call__(self, results):
        results['ori_img'] = results['img'].copy()
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}()'


@PIPELINES.register_module()
class StrongAugmentation(_Photometric):
    """writes a second, independently-distorted ``img_strong_aug`` view
    (``transforms.py:1062-1160``)."""

    def __call__(self, results):
        results['img_strong_aug'] = self._apply(results['img'].copy())
        results.setdefault('img_fields', ['img'])
        if 'img_strong_aug' not in results['img_fields']:
            results['img_fields'].append('img_strong_aug')
        return results

    def __repr__(self):
        return f'{self.__class__.__name__}()'
