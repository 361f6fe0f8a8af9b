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


def test_fold_batch_norms_output_identical():
    """Folded conv+BN variables produce the same inference output
    (pfst_tpu/core/fold_bn.py; deploy-time BN fusion equivalent)."""
    import jax
    import jax.numpy as jnp
    from conftest import tiny_model_cfg
    from pfst_tpu.core.fold_bn import fold_batch_norms
    from pfst_tpu.models import build_segmentor

    model = build_segmentor(tiny_model_cfg())
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x,
                           train=False)
    # non-trivial running stats so the fold actually moves numbers
    rs = np.random.RandomState(1)
    variables = jax.tree.map(lambda a: a, variables)  # unfreeze copy
    bs = jax.tree.map(
        lambda a: jnp.asarray(a + 0.05 * rs.randn(*a.shape),
                              a.dtype), variables['batch_stats'])
    variables = {'params': variables['params'], 'batch_stats': bs}
    ref, _ = model.apply(variables, x, method=model.encode_decode)
    folded = fold_batch_norms(variables)
    out, _ = model.apply(folded, x, method=model.encode_decode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)
    # the fold really rewrote the BN leaves
    flat = jax.tree.leaves(folded['batch_stats'])
    means = [a for a in flat if a.ndim == 1]
    assert any(np.allclose(np.asarray(a), 0) for a in means)
