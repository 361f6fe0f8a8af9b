"""Point sampling at arbitrary normalized coordinates.

Mirror of mmcv's ``point_sample`` (used by the reference PointRend
head, ``rsiseg/models/decode_heads/point_head.py``): sample (B,H,W,C)
features at (B,N,2) coordinates in [0,1]x[0,1] (x=width first, like
``F.grid_sample`` on ``2*coords-1``).  Bilinear matches grid_sample's
zero padding outside the image; nearest clamps (used only for labels
whose coords are strictly inside).  Pure gathers — jit/TPU friendly.
"""
from __future__ import annotations

import jax.numpy as jnp


def _gather(feat_flat, yi, xi, w):
    idx = yi * w + xi                                # (B,N)
    return jnp.take_along_axis(feat_flat, idx[..., None], axis=1)


def point_sample(feat, coords, mode: str = 'bilinear',
                 align_corners: bool = False):
    """feat (B,H,W,C), coords (B,N,2) in [0,1] (x,y) -> (B,N,C)."""
    b, h, w, c = feat.shape
    x = coords[..., 0]
    y = coords[..., 1]
    if align_corners:
        xu = x * (w - 1)
        yu = y * (h - 1)
    else:
        xu = x * w - 0.5
        yu = y * h - 0.5
    flat = feat.reshape(b, h * w, c)

    if mode == 'nearest':
        xi = jnp.clip(jnp.round(xu), 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.round(yu), 0, h - 1).astype(jnp.int32)
        return _gather(flat, yi, xi, w)

    x0 = jnp.floor(xu)
    y0 = jnp.floor(yu)
    wx = (xu - x0)[..., None]
    wy = (yu - y0)[..., None]
    out = 0.0
    for dy, fy in ((0, 1 - wy), (1, wy)):
        for dx, fx in ((0, 1 - wx), (1, wx)):
            xi = x0 + dx
            yi = y0 + dy
            valid = ((xi >= 0) & (xi < w) & (yi >= 0) &
                     (yi < h))[..., None]
            g = _gather(flat,
                        jnp.clip(yi, 0, h - 1).astype(jnp.int32),
                        jnp.clip(xi, 0, w - 1).astype(jnp.int32), w)
            out = out + jnp.where(valid, g, 0.0) * fy * fx
    return out
