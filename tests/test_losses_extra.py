"""Dice / Focal / Lovasz torch parity.

The torch side re-derives the reference implementations line-for-line
(mmcv is not installed so ``rsiseg`` cannot be imported; citations per
block):

* Dice  — ``rsiseg/models/losses/dice_loss.py:12-47,106-123`` incl.
  the clamp-to-C-1 of ignored labels whose one-hot leaks into the
  un-masked denominator.
* Focal — ``rsiseg/models/losses/focal_loss.py:13-69`` (the
  py_sigmoid branch every non-CUDA run takes) with the forward's
  flatten + valid-mask plumbing (``:243-302``).
* Lovasz — ``rsiseg/models/losses/lovasz_loss.py:15-27,140-170``
  (Berman lovasz_softmax with boolean ignore filtering; ours keeps
  static shapes by sinking zero-error ignored pixels to the tail of
  the descending sort, which contributes exactly 0 to the dot).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pfst_tpu.models.losses.dice_loss import DiceLoss
from pfst_tpu.models.losses.focal_loss import FocalLoss
from pfst_tpu.models.losses.lovasz_loss import LovaszLoss


def _data(seed=0, B=2, C=5, H=9, W=11, p_ignore=0.2):
    rs = np.random.RandomState(seed)
    logits = rs.randn(B, C, H, W).astype(np.float32)
    labels = rs.randint(0, C, (B, H, W))
    labels = np.where(rs.rand(B, H, W) < p_ignore, 255, labels)
    return logits, labels.astype(np.int64)


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


# ---------------------------------------------------------- dice ----

def torch_dice(logits, labels, smooth, exponent, class_weight,
               ignore_index=255):
    pred = F.softmax(torch.from_numpy(logits), dim=1)
    target = torch.from_numpy(labels)
    C = pred.shape[1]
    one_hot = F.one_hot(torch.clamp(target, 0, C - 1), C)  # :108-110
    valid = (target != ignore_index).long()
    total = 0
    for i in range(C):  # dice_loss :23-34 (+ inner mean from the
        p = pred[:, i].reshape(pred.shape[0], -1)  # weighted_loss deco)
        t = one_hot[..., i].reshape(pred.shape[0], -1).float()
        v = valid.reshape(pred.shape[0], -1)
        num = (p * t * v).sum(1) * 2 + smooth
        den = (p.pow(exponent) + t.pow(exponent)).sum(1) + smooth
        d = (1 - num / den).mean()
        if class_weight is not None:
            d = d * class_weight[i]
        total = total + d
    return float(total / C)


@pytest.mark.parametrize('smooth,exponent,cw', [
    (1, 2, None), (2.0, 3, [0.5, 1.0, 1.5, 0.7, 1.3])])
def test_dice_torch_parity(smooth, exponent, cw):
    logits, labels = _data(seed=1)
    ref = torch_dice(logits, labels, smooth, exponent, cw)
    got = float(DiceLoss(smooth=smooth, exponent=exponent,
                         class_weight=cw)(
        _nhwc(logits), jnp.asarray(labels)))
    assert abs(got - ref) < 1e-5, (got, ref)


# --------------------------------------------------------- focal ----

def torch_focal(logits, labels, gamma, alpha, class_weight, weight,
                ignore_index=255):
    B, C, H, W = logits.shape
    pred = torch.from_numpy(logits).permute(0, 2, 3, 1).reshape(-1, C)
    target = torch.from_numpy(labels).view(-1)
    valid = (target != ignore_index).view(-1, 1)  # :263
    target = torch.where(target == ignore_index,
                         torch.zeros_like(target), target)
    onehot = F.one_hot(target, C).float()
    ps = pred.sigmoid()
    one_minus_pt = (1 - ps) * onehot + ps * (1 - onehot)
    fw = (alpha * onehot + (1 - alpha) * (1 - onehot)) * \
        one_minus_pt.pow(gamma)
    loss = F.binary_cross_entropy_with_logits(
        pred, onehot, reduction='none') * fw
    final = torch.ones(1, C)
    if weight is not None:
        final = final * torch.from_numpy(weight).view(-1, 1)
    if class_weight is not None:
        final = final * torch.tensor(class_weight)
    final = final * valid
    return float((loss * final).mean())


@pytest.mark.parametrize('gamma,alpha,cw,use_w', [
    (2.0, 0.5, None, False), (3.0, 0.25, [1., .5, 2., .8, 1.2], True)])
def test_focal_torch_parity(gamma, alpha, cw, use_w):
    logits, labels = _data(seed=2)
    w = (np.random.RandomState(9).rand(labels.size)
         .astype(np.float32) if use_w else None)
    ref = torch_focal(logits, labels, gamma, alpha, cw, w)
    got = float(FocalLoss(gamma=gamma, alpha=alpha, class_weight=cw)(
        _nhwc(logits), jnp.asarray(labels),
        weight=None if w is None else
        jnp.asarray(w.reshape(labels.shape))))
    assert abs(got - ref) < 1e-6, (got, ref)


# -------------------------------------------------------- lovasz ----

def torch_lovasz_grad(gt_sorted):
    p = len(gt_sorted)
    gts = gt_sorted.sum()
    inter = gts - gt_sorted.float().cumsum(0)
    union = gts + (1 - gt_sorted).float().cumsum(0)
    jac = 1. - inter / union
    if p > 1:
        jac[1:p] = jac[1:p] - jac[0:-1]
    return jac


def torch_lovasz(logits, labels, classes, per_image, class_weight,
                 ignore_index=255):
    probs = F.softmax(torch.from_numpy(logits), dim=1)
    labels_t = torch.from_numpy(labels)

    def flat(pr, lb):  # lovasz_softmax_flat :147-170
        C = pr.shape[1]
        pr = pr.permute(0, 2, 3, 1).reshape(-1, C)
        lb = lb.view(-1)
        keep = lb != ignore_index
        pr, lb = pr[keep], lb[keep]
        losses = []
        for c in range(C):
            fg = (lb == c).float()
            if classes == 'present' and fg.sum() == 0:
                continue
            errors = (fg - pr[:, c]).abs()
            es, perm = torch.sort(errors, 0, descending=True)
            loss = torch.dot(es, torch_lovasz_grad(fg[perm]))
            if class_weight is not None:
                loss = loss * class_weight[c]
            losses.append(loss)
        return torch.stack(losses).mean()

    if per_image:
        return float(torch.stack(
            [flat(probs[i:i + 1], labels_t[i:i + 1])
             for i in range(len(labels))]).mean())
    return float(flat(probs, labels_t))


@pytest.mark.parametrize('classes,per_image,cw', [
    ('present', False, None),
    ('present', True, None),
    ('all', False, [1., .5, 2., .8, 1.2])])
def test_lovasz_torch_parity(classes, per_image, cw):
    logits, labels = _data(seed=3)
    # guarantee every class present somewhere for classes='all'
    labels[0, 0, :5] = np.arange(5)
    ref = torch_lovasz(logits, labels, classes, per_image, cw)
    got = float(LovaszLoss(classes=classes, per_image=per_image,
                           class_weight=cw)(
        _nhwc(logits), jnp.asarray(labels)))
    assert abs(got - ref) < 1e-5, (got, ref)


def test_lovasz_absent_class_present_mode():
    """'present' skips absent classes from the mean (:153-154)."""
    logits, labels = _data(seed=4)
    labels = np.where(labels == 3, 0, labels)  # class 3 nowhere
    ref = torch_lovasz(logits, labels, 'present', False, None)
    got = float(LovaszLoss(classes='present')(
        _nhwc(logits), jnp.asarray(labels)))
    assert abs(got - ref) < 1e-5, (got, ref)
