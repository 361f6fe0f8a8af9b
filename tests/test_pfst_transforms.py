"""Geometric replay (`transform_by_metas`) parity checks.

Covers the full reference stage order
(``rsiseg/models/utils/pfst_transforms.py:11-51``): scale -> crop ->
rot90 -> flip -> pad, including the traced per-sample rot/flip path
used by PFSTV4 and the static shape-changing stages used by the FMDA
adaptors.
"""
import numpy as np

import jax.numpy as jnp

from pfst_tpu.models.utils.pfst_transforms import (proportional_crop,
                                                   transform_by_metas)


def test_rot_flip_per_sample():
    rs = np.random.RandomState(0)
    x = rs.rand(3, 6, 6, 2).astype(np.float32)
    out = transform_by_metas(
        jnp.asarray(x),
        dict(rotate_k=np.array([0, 1, 3]),
             flip_vertical=np.array([0, 1, 0]),
             flip_horizontal=np.array([1, 0, 0])))
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], x[0, :, ::-1])
    np.testing.assert_allclose(out[1],
                               np.rot90(x[1], 1, axes=(0, 1))[::-1])
    np.testing.assert_allclose(out[2], np.rot90(x[2], 3, axes=(0, 1)))


def test_flip_direction_meta_form():
    rs = np.random.RandomState(1)
    x = rs.rand(2, 4, 5, 1).astype(np.float32)
    out = transform_by_metas(
        jnp.asarray(x), dict(flip=True, flip_direction='horizontal'))
    np.testing.assert_allclose(np.asarray(out), x[:, :, ::-1])


def test_proportional_crop():
    x = jnp.arange(2 * 16 * 16 * 3, dtype=jnp.float32).reshape(
        2, 16, 16, 3)
    # bbox recorded at 8x resolution: (y1,y2,x1,x2) = (16,80,24,104)
    out = proportional_crop(x, (16, 80, 24, 104), 1 / 8.)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x)[:, 2:10, 3:13])


def test_scale_crop_pad_pipeline():
    rs = np.random.RandomState(2)
    x = rs.rand(1, 8, 8, 2).astype(np.float32)
    out = transform_by_metas(
        jnp.asarray(x),
        dict(scale_factor=(2.0, 2.0, 2.0, 2.0),
             crop_bbox=(0, 96, 0, 96),        # at 8x: 12x12 crop
             pad_shape=(128, 128, 3)),        # at 1/8: pad to 16x16
        scale=1 / 8.)
    assert out.shape == (1, 16, 16, 2)
    # padded region filled with the ignore value -1
    assert np.all(np.asarray(out)[:, 12:, :, :] == -1)
    assert np.all(np.asarray(out)[:, :, 12:, :] == -1)
    # cropped region is the bilinear upscale, strictly in [min,max]
    core = np.asarray(out)[:, :12, :12, :]
    assert core.min() >= x.min() - 1e-6 and core.max() <= x.max() + 1e-6


def test_scale_matches_torch_bilinear():
    # dims chosen so size-ratio == recorded factor exactly (as in real
    # pipelines, where Resize records new/old); torch's scale_factor=
    # coordinate mapping then agrees with size-based resize.
    import torch
    import torch.nn.functional as F
    rs = np.random.RandomState(3)
    x = rs.rand(1, 6, 8, 3).astype(np.float32)
    out = transform_by_metas(jnp.asarray(x),
                             dict(scale_factor=(1.5, 1.5, 1.5, 1.5)))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        scale_factor=1.5, mode='bilinear',
                        align_corners=False)
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)
