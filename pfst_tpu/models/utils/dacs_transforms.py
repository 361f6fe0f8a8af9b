"""On-device DACS/ClassMix augmentations (pure JAX, NHWC).

TPU-native replacement for ``rsiseg/models/utils/dacs_transforms.py``
(kornia + per-sample Python loops in the reference).  Everything here
traces into the fused UDA train step: ClassMix mask generation, the
mask blend, color jitter and Gaussian blur — no host round-trips.

Semantics mirrored from the reference:
* ``get_class_masks`` samples, per image, ceil(n/2) of the classes
  present in the *whole batch* (``dacs_transforms.py:110-126`` uses
  ``torch.unique(labels)``, i.e. batch-level presence — including 255).
* ``strong_transform`` order: one_mix -> color_jitter -> gaussian_blur
  (``dacs_transforms.py:12-27``); the jitter/blur *gates* are shared
  across the batch (sampled once per iteration in ``pfgst.py:213-222``)
  while the per-image factors vary (kornia samples per call).
* color jitter runs on denormalised [0,1] images
  (``denorm_``/``renorm_``: ``dacs_transforms.py:44-53``).
* blur kernel size is the reference's data-size formula
  (``dacs_transforms.py:94-102``), sigma ~ U(0.15, 1.15) per image.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def denorm(img, mean, std):
    """normalized -> [0,1] domain (mean/std are per-channel, 0-255)."""
    return (img * std + mean) / 255.0


def renorm(img, mean, std):
    return (img * 255.0 - mean) / std


# ---------------------------------------------------------------------
# ClassMix
# ---------------------------------------------------------------------
def class_presence(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(num_classes+1,) presence over the whole batch; slot -1 is 255."""
    lbl = jnp.where(labels == 255, num_classes, labels).astype(jnp.int32)
    lbl = jnp.clip(lbl, 0, num_classes)
    hist = jnp.bincount(lbl.reshape(-1), length=num_classes + 1)
    return hist > 0


def sample_class_mask(key: jax.Array, label: jnp.ndarray,
                      present: jnp.ndarray,
                      num_classes: int) -> jnp.ndarray:
    """One image's ClassMix mask: 1 where the pixel's class is chosen.

    Chooses ceil(n_present/2) classes uniformly from the batch-present
    set via a random-score top-k (fixed shapes, no host sync).
    """
    c1 = num_classes + 1
    scores = jax.random.uniform(key, (c1,))
    scores = jnp.where(present, scores, -1.0)
    n_present = jnp.sum(present.astype(jnp.int32))
    n_choose = (n_present + n_present % 2) // 2  # ceil(n/2)
    # rank via sorted threshold: class chosen iff its score is among the
    # n_choose largest
    order = jnp.argsort(-scores)
    ranks = jnp.zeros((c1,), jnp.int32).at[order].set(jnp.arange(c1))
    chosen = (ranks < n_choose) & present
    lbl = jnp.where(label == 255, num_classes, label).astype(jnp.int32)
    lbl = jnp.clip(lbl, 0, num_classes)
    return chosen[lbl].astype(jnp.float32)


def get_class_masks(key: jax.Array, labels: jnp.ndarray,
                    num_classes: int) -> jnp.ndarray:
    """(B, H, W) float masks, one independent class choice per image."""
    b = labels.shape[0]
    present = class_presence(labels, num_classes)
    keys = jax.random.split(key, b)
    return jax.vmap(
        lambda k, l: sample_class_mask(k, l, present, num_classes))(
            keys, labels)


def one_mix(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
    """blend: mask*a + (1-mask)*b; mask (..., H, W) broadcast to data."""
    m = mask
    while m.ndim < a.ndim:
        m = m[..., None]
    return m * a + (1.0 - m) * b


# ---------------------------------------------------------------------
# Color jitter (torchvision/kornia-style, [0,1] domain)
# ---------------------------------------------------------------------
_RGB_WEIGHTS = jnp.array([0.299, 0.587, 0.114])


def _rgb_to_gray(img):
    return jnp.tensordot(img, _RGB_WEIGHTS, axes=[[-1], [0]])[..., None]


def _adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def _adjust_contrast(img, factor):
    mean = jnp.mean(_rgb_to_gray(img))
    return jnp.clip(mean + factor * (img - mean), 0.0, 1.0)


def _adjust_saturation(img, factor):
    gray = _rgb_to_gray(img)
    return jnp.clip(gray + factor * (img - gray), 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    dz = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / dz
    gc = (maxc - g) / dz
    bc = (maxc - b) / dz
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(img):
    """Branch-free hsv->rgb (k-formula) — compiles to a short
    elementwise chain instead of a 6-way stack + gather."""
    h, s, v = img[..., 0], img[..., 1], img[..., 2]

    def channel(n):
        k = jnp.mod(n + h * 6.0, 6.0)
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([channel(5.0), channel(3.0), channel(1.0)],
                     axis=-1)


def _adjust_hue(img, shift):
    hsv = _rgb_to_hsv(img)
    h = (hsv[..., 0] + shift) % 1.0
    return _hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter_single(key: jax.Array, img: jnp.ndarray, s: float):
    """Apply per-image jitter with strength ``s`` on a [0,1] HWC image."""
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - s), maxval=1 + s)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - s), maxval=1 + s)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - s), maxval=1 + s)
    hue_s = min(s, 0.5)
    fh = jax.random.uniform(kh, (), minval=-hue_s, maxval=hue_s)
    img = _adjust_brightness(img, fb)
    img = _adjust_contrast(img, fc)
    img = _adjust_saturation(img, fs)
    img = _adjust_hue(img, fh)
    return img


# ---------------------------------------------------------------------
# Gaussian blur
# ---------------------------------------------------------------------
def blur_kernel_size(h: int, w: int) -> Tuple[int, int]:
    """Reference kernel-size formula (``dacs_transforms.py:94-102``)."""

    def one(n):
        return int(
            math.floor(math.ceil(0.1 * n) - 0.5 + math.ceil(0.1 * n) % 2))

    return max(one(h), 1), max(one(w), 1)


def _blur_matrix(n: int, k: int, sigma) -> jnp.ndarray:
    """(n, n) banded Gaussian operator with reflect-101 borders.

    Expressing the separable blur as two matmuls keeps it on the MXU
    and sidesteps TPU convolution codegen for exotic kernel sizes
    (the 51-tap depthwise conv stalled the remote compiler)."""
    pad = k // 2
    taps = jnp.arange(k, dtype=jnp.float32) - pad
    g = jnp.exp(-(taps**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    rows = jnp.arange(n)[:, None]                     # (n, 1)
    pos = rows + jnp.arange(-pad, pad + 1)[None, :]   # (n, k)
    # reflect-101: -p -> p, n-1+p -> n-1-p (may need several folds for
    # k approaching n; two folds cover k <= 2n which holds here)
    pos = jnp.abs(pos)
    pos = (n - 1) - jnp.abs((n - 1) - pos)
    pos = jnp.abs(pos)
    mat = jnp.zeros((n, n), jnp.float32)
    mat = mat.at[jnp.broadcast_to(rows, pos.shape), pos].add(
        jnp.broadcast_to(g[None, :], pos.shape))
    return mat


def gaussian_blur_single(img: jnp.ndarray, sigma: jnp.ndarray,
                         ksize: Tuple[int, int]) -> jnp.ndarray:
    """Separable Gaussian blur, HWC, reflect-101 padding (kornia
    GaussianBlur2d default border) — as two MXU matmuls."""
    ky, kx = ksize
    h, w, c = img.shape
    ay = _blur_matrix(h, ky, sigma)
    ax = _blur_matrix(w, kx, sigma)
    # (H,W,C): blur rows then columns
    out = jnp.einsum('ih,hwc->iwc', ay, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum('jw,iwc->ijc', ax, out,
                     preferred_element_type=jnp.float32)
    return out.astype(img.dtype)


def gaussian_blur_batch(key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """Per-image sigma ~ U(0.15, 1.15), NHWC batch."""
    b, h, w, _ = img.shape
    ksize = blur_kernel_size(h, w)
    sigmas = jax.random.uniform(key, (b,), minval=0.15, maxval=1.15)
    return jax.vmap(lambda im, s: gaussian_blur_single(im, s, ksize))(
        img, sigmas)


# ---------------------------------------------------------------------
# strong_transform: the fused mix + jitter + blur
# ---------------------------------------------------------------------
def strong_transform(key: jax.Array,
                     mix_mask: jnp.ndarray,
                     data_pair: Optional[Tuple[jnp.ndarray,
                                               jnp.ndarray]] = None,
                     target_pair: Optional[Tuple[jnp.ndarray,
                                                 jnp.ndarray]] = None,
                     jitter_gate: Optional[jnp.ndarray] = None,
                     blur_gate: Optional[jnp.ndarray] = None,
                     color_jitter_s: float = 0.2,
                     color_jitter_p: float = 0.2,
                     mean: Optional[jnp.ndarray] = None,
                     std: Optional[jnp.ndarray] = None,
                     denorm_type: str = 'mean_std'):
    """One sample's strong transform (``dacs_transforms.py:12-27``).

    ``data_pair``/``target_pair`` are (source, target) HWC / HW arrays;
    gates are scalars shared across the batch.  Returns (data, target).
    """
    data = target = None
    if data_pair is not None:
        data = one_mix(mix_mask, data_pair[0], data_pair[1])
    if target_pair is not None:
        target = one_mix(mix_mask, target_pair[0], target_pair[1])
    if data is not None and data.shape[-1] == 3:
        kj, kb = jax.random.split(key)

        def jitter(d):
            if denorm_type == 'mean_std':
                d01 = denorm(d, mean, std)
            else:
                d01 = d
            d01 = color_jitter_single(kj, d01, color_jitter_s)
            if denorm_type == 'mean_std':
                return renorm(d01, mean, std)
            return d01

        if jitter_gate is not None:
            data = jax.lax.cond(jitter_gate > color_jitter_p, jitter,
                                lambda d: d, data)
        if blur_gate is not None:
            h, w = data.shape[0], data.shape[1]
            ksize = blur_kernel_size(h, w)
            sig_key = jax.random.fold_in(kb, 1)
            sigma = jax.random.uniform(sig_key, (), minval=0.15,
                                       maxval=1.15)
            data = jax.lax.cond(
                blur_gate > 0.5,
                lambda d: gaussian_blur_single(d, sigma, ksize),
                lambda d: d, data)
    return data, target
