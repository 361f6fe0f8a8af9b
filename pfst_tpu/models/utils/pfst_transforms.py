"""Geometric-augmentation replay (mirror of
``rsiseg/models/utils/pfst_transforms.py:11-51``).

The reference replays the Resize/crop/rot90/flip recorded in img_metas
onto teacher outputs (``pfst_v4.py:254-259``, ``fmda_adaptor.py:209``).
Here the shape-changing stages (``scale_factor``, ``crop_bbox``,
``pad_shape``) consume *static* host-side meta values so the result
has a trace-time shape, while rot90/flip consume per-sample traced
int arrays (``rotate_k``, ``flip_vertical``, ``flip_horizontal``) via
``lax.switch``/``lax.cond`` — the whole replay stays jittable.

Deviations from the reference (both deliberate):

* ``pfst_transforms.py:19`` passes ``scale_factor=(w_scale, h_scale)``
  to ``F.interpolate`` on NCHW data, applying the *width* scale to the
  height axis; we apply ``h_scale`` to H and ``w_scale`` to W (the
  recorded factors are equal in every shipped pipeline, so the results
  agree there).
* ``pfst_transforms.py:49`` pads ``(0, pad_W-W, 0, pad_W-W)`` — the
  width delta twice, never the height; we pad H by ``pad_H-H`` and W
  by ``pad_W-W`` (fill -1 = ignore), which is the evident intent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import resize


def proportional_crop(data: jnp.ndarray, crop_bbox, scale: float
                      ) -> jnp.ndarray:
    """Crop (B,H,W,C) by a bbox recorded at full resolution, rescaled
    to this feature map's stride (``pfst_transforms.py:4-9``).
    ``crop_bbox`` = (y1, y2, x1, x2), static Python ints."""
    y1, y2, x1, x2 = (int(v * scale) for v in crop_bbox)
    return data[:, y1:y2, x1:x2, :]


def _replay_one(img, rotate_k, flip_v, flip_h):
    # rot90 by a traced k: compose via lax.switch over the 4 cases.
    # All four branches must agree in shape, so a recorded rotation
    # requires square data (true of every rotating pipeline); when
    # rotate_k is None the switch is skipped and non-square data is
    # fine.
    if rotate_k is not None:
        def rot(k):
            return lambda x: jnp.rot90(x, k=k, axes=(0, 1))

        img = jax.lax.switch(jnp.clip(rotate_k, 0, 3),
                             [rot(0), rot(1), rot(2), rot(3)], img)
    img = jax.lax.cond(flip_v > 0, lambda x: jnp.flip(x, axis=0),
                       lambda x: x, img)
    img = jax.lax.cond(flip_h > 0, lambda x: jnp.flip(x, axis=1),
                       lambda x: x, img)
    return img


def transform_by_metas(data: jnp.ndarray, metas: dict,
                       scale: float = 1 / 8.) -> jnp.ndarray:
    """Replay recorded augmentations onto (B, H, W, C) data.

    Stage order matches the reference: resize -> crop -> rot90 ->
    flip -> pad.  ``scale_factor`` (h_scale, w_scale floats),
    ``crop_bbox`` and ``pad_shape`` must be static Python values;
    ``rotate_k``/``flip_*`` may be traced per-sample arrays.
    """
    if metas.get('scale_factor') is not None:
        sf = metas['scale_factor']
        h_scale, w_scale = (float(sf[1]), float(sf[0])) \
            if hasattr(sf, '__len__') else (float(sf), float(sf))
        new_h = int(data.shape[1] * h_scale)
        new_w = int(data.shape[2] * w_scale)
        if (new_h, new_w) != data.shape[1:3]:
            data = resize(data, size=(new_h, new_w), mode='bilinear',
                          align_corners=False)

    if metas.get('crop_bbox') is not None:
        data = proportional_crop(data, metas['crop_bbox'], scale)

    b = data.shape[0]
    zeros = jnp.zeros((b,), jnp.int32)
    rotate_k = metas.get('rotate_k')
    if rotate_k is not None:
        rotate_k = jnp.broadcast_to(
            jnp.asarray(rotate_k, jnp.int32), (b,))
    flip_v = jnp.broadcast_to(jnp.asarray(
        metas.get('flip_vertical', zeros), jnp.int32), (b,))
    flip_h = jnp.broadcast_to(jnp.asarray(
        metas.get('flip_horizontal', zeros), jnp.int32), (b,))
    # 'flip'/'flip_direction' meta form (pfst_transforms.py:34-39)
    if metas.get('flip', False):
        direction = metas.get('flip_direction', 'horizontal')
        if 'horizontal' in direction:
            flip_h = jnp.ones((b,), jnp.int32)
        if 'vertical' in direction:
            flip_v = jnp.ones((b,), jnp.int32)
    replay = (lambda d, v, hh: _replay_one(d, None, v, hh)) \
        if rotate_k is None else _replay_one
    args = (data, flip_v, flip_h) if rotate_k is None else \
        (data, rotate_k, flip_v, flip_h)
    data = jax.vmap(replay)(*args)

    if metas.get('pad_shape') is not None:
        pad_h = int(metas['pad_shape'][0] * scale)
        pad_w = int(metas['pad_shape'][1] * scale)
        h, w = data.shape[1:3]
        if pad_h != h or pad_w != w:
            data = jnp.pad(
                data,
                ((0, 0), (0, max(pad_h - h, 0)), (0, max(pad_w - w, 0)),
                 (0, 0)),
                constant_values=-1)
    return data
