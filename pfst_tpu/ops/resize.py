"""Resize ops with PyTorch-compatible sampling semantics.

TPU-native replacement for ``rsiseg/ops/wrappers.py:8-27`` (which wraps
``torch.nn.functional.interpolate``).  All tensors are NHWC (TPU-native
layout).  Three torch behaviours are reproduced exactly because mIoU
parity depends on them:

* bilinear ``align_corners=False``: half-pixel source centers
  ``src = (dst + 0.5) * scale - 0.5`` with edge clamping — identical to
  ``jax.image.resize(method='linear', antialias=False)``.
* bilinear ``align_corners=True``: corner-aligned grid
  ``src = dst * (S - 1) / (D - 1)``.
* nearest: torch's legacy asymmetric rule ``src = floor(dst * S / D)``
  (NOT half-pixel rounding, which jax.image uses).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def _out_size(in_size: Tuple[int, int],
              size: Optional[Sequence[int]],
              scale_factor: Optional[Union[float, Sequence[float]]]):
    if size is not None:
        return (int(size[0]), int(size[1]))
    if scale_factor is None:
        raise ValueError('either size or scale_factor must be given')
    if isinstance(scale_factor, (int, float)):
        scale_factor = (scale_factor, scale_factor)
    return (int(in_size[0] * scale_factor[0]),
            int(in_size[1] * scale_factor[1]))


def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    """Return (lo_idx, hi_idx, hi_weight) along one dimension."""
    if out_size == 1:
        # torch: single output pixel samples src coordinate 0 (align) or
        # center-clamped 0 as well after clamping.
        lo = jnp.zeros((1,), jnp.int32)
        return lo, lo, jnp.zeros((1,), jnp.float32)
    dst = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        src = dst * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = jnp.clip((dst + 0.5) * scale - 0.5, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = src - lo.astype(jnp.float32)
    return lo, hi, w


def resize(x: jax.Array,
           size: Optional[Sequence[int]] = None,
           scale_factor: Optional[Union[float, Sequence[float]]] = None,
           mode: str = 'bilinear',
           align_corners: Optional[bool] = None,
           warning: bool = False) -> jax.Array:
    """Resize NHWC (or HWC) ``x`` to ``size=(H, W)``."""
    del warning
    squeeze = False
    if x.ndim == 3:
        x = x[None]
        squeeze = True
    if x.ndim != 4:
        raise ValueError(f'expected NHWC input, got shape {x.shape}')
    in_h, in_w = x.shape[1], x.shape[2]
    out_h, out_w = _out_size((in_h, in_w), size, scale_factor)

    if (out_h, out_w) == (in_h, in_w):
        out = x
    elif mode == 'nearest':
        # torch legacy nearest: floor(dst * in/out)
        hi = jnp.floor(
            jnp.arange(out_h, dtype=jnp.float32) * (in_h / out_h)
        ).astype(jnp.int32)
        wi = jnp.floor(
            jnp.arange(out_w, dtype=jnp.float32) * (in_w / out_w)
        ).astype(jnp.int32)
        out = x[:, hi][:, :, wi]
    elif mode == 'bilinear':
        ac = bool(align_corners)
        if not ac:
            out = jax.image.resize(
                x, (x.shape[0], out_h, out_w, x.shape[3]),
                method='linear', antialias=False)
            out = out.astype(x.dtype) if jnp.issubdtype(
                x.dtype, jnp.floating) else out
        else:
            hlo, hhi, hw = _linear_weights(in_h, out_h, True)
            wlo, whi, ww = _linear_weights(in_w, out_w, True)
            xf = x.astype(jnp.float32)
            top = xf[:, hlo]
            bot = xf[:, hhi]
            row = top + (bot - top) * hw[None, :, None, None]
            left = row[:, :, wlo]
            right = row[:, :, whi]
            out = left + (right - left) * ww[None, None, :, None]
            out = out.astype(x.dtype) if jnp.issubdtype(
                x.dtype, jnp.floating) else out
    else:
        raise ValueError(f'unsupported mode {mode}')
    return out[0] if squeeze else out


def adaptive_avg_pool_1x1(x: jax.Array) -> jax.Array:
    """Global average pool to 1x1, NHWC."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
