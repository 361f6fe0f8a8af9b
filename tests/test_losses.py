"""Loss parity vs torch (CE with ignore/class-weight/pixel-weight and
the legacy all-pixel averaging the reference relies on)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pfst_tpu.models.losses import (CrossEntropyLoss, accuracy,
                                    cross_entropy)


def _torch_ce(pred_nhwc, label, weight=None, class_weight=None,
              avg_non_ignore=False, ignore_index=255):
    """Reference math (``cross_entropy_loss.py:12-65``) in torch."""
    pred = torch.from_numpy(pred_nhwc).permute(0, 3, 1, 2)
    label = torch.from_numpy(label).long()
    cw = torch.tensor(class_weight, dtype=torch.float32) \
        if class_weight is not None else None
    loss = F.cross_entropy(pred, label, weight=cw, reduction='none',
                           ignore_index=ignore_index)
    avg_factor = None
    if avg_non_ignore:
        avg_factor = label.numel() - (label == ignore_index).sum().item()
    if weight is not None:
        loss = loss * torch.from_numpy(weight).float()
    if avg_factor is None:
        return loss.mean().item()
    eps = torch.finfo(torch.float32).eps
    return (loss.sum() / (avg_factor + eps)).item()


@pytest.mark.parametrize('avg_non_ignore', [False, True])
@pytest.mark.parametrize('use_class_weight', [False, True])
@pytest.mark.parametrize('use_pixel_weight', [False, True])
def test_ce_matches_torch(avg_non_ignore, use_class_weight,
                          use_pixel_weight, rng):
    B, H, W, C = 2, 8, 8, 6
    pred = rng.randn(B, H, W, C).astype(np.float32)
    label = rng.randint(0, C, (B, H, W)).astype(np.int32)
    label[0, :2] = 255  # ignored region
    cw = rng.rand(C).astype(np.float32).tolist() if use_class_weight \
        else None
    pw = rng.rand(B, H, W).astype(np.float32) if use_pixel_weight \
        else None
    ours = float(cross_entropy(
        jnp.asarray(pred), jnp.asarray(label),
        weight=jnp.asarray(pw) if pw is not None else None,
        class_weight=cw, ignore_index=255,
        avg_non_ignore=avg_non_ignore))
    theirs = _torch_ce(pred, label, pw, cw, avg_non_ignore)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_ce_loss_class_weighting_and_loss_weight(rng):
    B, H, W, C = 1, 4, 4, 3
    pred = rng.randn(B, H, W, C).astype(np.float32)
    label = rng.randint(0, C, (B, H, W)).astype(np.int32)
    loss_fn = CrossEntropyLoss(loss_weight=0.4)
    base = float(cross_entropy(jnp.asarray(pred), jnp.asarray(label),
                               ignore_index=255))
    got = float(loss_fn(jnp.asarray(pred), jnp.asarray(label),
                        ignore_index=255))
    np.testing.assert_allclose(got, 0.4 * base, rtol=1e-6)


def test_accuracy_percentage(rng):
    pred = np.zeros((1, 2, 2, 3), np.float32)
    pred[..., 1] = 10.0  # always predicts class 1
    label = np.array([[[1, 1], [0, 255]]], np.int32)
    acc = float(accuracy(jnp.asarray(pred), jnp.asarray(label),
                         ignore_index=255))
    np.testing.assert_allclose(acc, 100.0 * 2 / 3, rtol=1e-5)


def test_all_ignored_is_finite():
    pred = np.zeros((1, 2, 2, 3), np.float32)
    label = np.full((1, 2, 2), 255, np.int32)
    loss = float(cross_entropy(jnp.asarray(pred), jnp.asarray(label),
                               ignore_index=255))
    acc = float(accuracy(jnp.asarray(pred), jnp.asarray(label),
                         ignore_index=255))
    assert np.isfinite(loss) and loss == 0.0
    assert np.isfinite(acc)


def test_pseudo_label_and_local_pseudo_feat_losses():
    """Runnable realisations of the reference's dev-code losses
    (pseudo_label_loss.py / local_pseudo_feat_loss.py)."""
    import jax.numpy as jnp

    from pfst_tpu.models.losses.pseudo_label_loss import (
        LocalPseudoFeatLoss, PseudoLabelLoss)

    rs = np.random.RandomState(0)
    b, h, w, c, ch = 2, 8, 10, 4, 6
    tensors = dict(
        logits_trg=jnp.asarray(rs.randn(b, h, w, c), jnp.float32),
        logits_ema=jnp.asarray(rs.randn(b, h // 2, w // 2, c),
                               jnp.float32),
        gt_src=jnp.asarray(rs.randint(0, c, (b, 2 * h, 2 * w)),
                           jnp.int32),
        x_src=[jnp.asarray(rs.randn(b, h, w, ch), jnp.float32)
               for _ in range(3)],
        x_ema=[jnp.asarray(rs.randn(b, h, w, ch), jnp.float32)
               for _ in range(3)],
    )
    out = PseudoLabelLoss(weights={'loss_pseudo': 0.5})(tensors)
    assert set(out) == {'loss_pseudo'}
    assert np.isfinite(np.asarray(out['loss_pseudo']))
    assert float(out['loss_pseudo']) > 0

    out2 = LocalPseudoFeatLoss(
        top_k=2, dilation=1, kernel_size=3, feat_level=2,
        weights=dict(src_pos=0.3, src_neg=0.2, sim_pos=0.5))(tensors)
    assert set(out2) == {'loss_src_pos', 'loss_src_neg',
                         'loss_sim_pos'}
    for v in out2.values():
        assert np.isfinite(np.asarray(v))


def test_accuracy_topk():
    import jax.numpy as jnp

    from pfst_tpu.models.losses.accuracy import accuracy

    pred = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 5),
                       np.float32)
    target = jnp.asarray(np.random.RandomState(1).randint(0, 5, (2, 8, 8)))
    top1 = float(accuracy(pred, target, topk=1))
    top3 = float(accuracy(pred, target, topk=3))
    top5 = float(accuracy(pred, target, topk=5))
    assert 0.0 <= top1 <= top3 <= top5 <= 100.0 + 1e-5
    assert abs(top5 - 100.0) < 1e-3
