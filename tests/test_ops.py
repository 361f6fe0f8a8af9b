"""Parity tests: resize / unfold vs torch reference semantics."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pfst_tpu.ops import resize, unfold_neighbors


@pytest.mark.parametrize('size', [(7, 9), (16, 16), (33, 17)])
@pytest.mark.parametrize('out', [(14, 18), (5, 5), (64, 64)])
@pytest.mark.parametrize('align', [False, True])
def test_bilinear_resize_matches_torch(size, out, align, rng):
    x = rng.randn(2, *size, 3).astype(np.float32)
    ours = np.asarray(resize(jnp.asarray(x), size=out, mode='bilinear',
                             align_corners=align))
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out,
        mode='bilinear', align_corners=align).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('size,out', [((8, 8), (4, 4)), ((5, 7), (9, 3)),
                                      ((16, 16), (7, 7))])
def test_nearest_resize_matches_torch(size, out, rng):
    x = rng.randn(1, *size, 2).astype(np.float32)
    ours = np.asarray(resize(jnp.asarray(x), size=out, mode='nearest'))
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out,
        mode='nearest').permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=0, rtol=0)


@pytest.mark.parametrize('k,d', [(3, 1), (3, 2), (3, 4), (5, 1)])
def test_unfold_matches_torch(k, d, rng):
    x = rng.randn(2, 10, 12, 5).astype(np.float32)
    ours = np.asarray(unfold_neighbors(jnp.asarray(x), k, d))
    # torch: (B, C*k*k, H*W) with padding k//2*d
    t = torch.nn.Unfold(kernel_size=k, padding=(k // 2) * d, dilation=d)(
        torch.from_numpy(x).permute(0, 3, 1, 2))
    b, _, l = t.shape
    theirs = t.reshape(b, 5, k * k, 10, 12).permute(
        0, 3, 4, 2, 1).numpy()  # -> (B,H,W,k2,C)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_unfold_center_is_identity(rng):
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    u = np.asarray(unfold_neighbors(jnp.asarray(x), 3, 2))
    np.testing.assert_allclose(u[:, :, :, 4, :], x)
