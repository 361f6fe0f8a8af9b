"""Dice loss (mirror of ``rsiseg/models/losses/dice_loss.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import get_class_weight, weight_reduce_loss


def dice_loss(pred, target, valid_mask, smooth=1, exponent=2,
              class_weight=None, ignore_index=255):
    """pred NHWC probs, target one-hot NHWC, valid (B,H,W)."""
    num_classes = pred.shape[-1]
    total = 0.0
    for i in range(num_classes):
        if i == ignore_index:
            continue
        d = binary_dice_loss(pred[..., i], target[..., i], valid_mask,
                             smooth, exponent)
        if class_weight is not None:
            d = d * class_weight[i]
        total = total + d
    # mean over ALL classes (reference ``dice_loss.py`` divides by
    # num_classes even when ignore_index drops one)
    return total / num_classes


def binary_dice_loss(pred, target, valid_mask, smooth=1, exponent=2):
    pred = pred.reshape(pred.shape[0], -1)
    target = target.reshape(target.shape[0], -1)
    valid = valid_mask.reshape(valid_mask.shape[0], -1)
    num = jnp.sum(pred * target * valid, axis=1) * 2 + smooth
    den = jnp.sum(pred**exponent + target.astype(jnp.float32)**exponent,
                  axis=1) + smooth
    return 1 - num / den


@LOSSES.register_module()
class DiceLoss:

    def __init__(self, smooth=1, exponent=2, reduction='mean',
                 class_weight=None, loss_weight=1.0, ignore_index=255,
                 loss_name='loss_dice', **kwargs):
        self.smooth = smooth
        self.exponent = exponent
        self.reduction = reduction
        self.class_weight = get_class_weight(class_weight)
        self.loss_weight = loss_weight
        self.ignore_index = ignore_index
        self._loss_name = loss_name

    @property
    def loss_name(self):
        return self._loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=None, **kwargs):
        reduction = reduction_override or self.reduction
        ignore = self.ignore_index if ignore_index is None \
            else ignore_index
        num_classes = pred.shape[-1]
        probs = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        valid = (target != ignore)
        # reference ``dice_loss.py:108-110`` clamps labels to
        # [0, C-1] — ignored 255s one-hot into class C-1, and the
        # UN-masked denominator of binary_dice_loss sees them.
        safe = jnp.clip(target, 0, num_classes - 1).astype(jnp.int32)
        one_hot = jax.nn.one_hot(safe, num_classes)
        loss = dice_loss(probs, one_hot, valid.astype(jnp.float32),
                         self.smooth, self.exponent, self.class_weight,
                         ignore_index=-1)
        loss = weight_reduce_loss(loss, None, reduction, avg_factor)
        return self.loss_weight * loss
