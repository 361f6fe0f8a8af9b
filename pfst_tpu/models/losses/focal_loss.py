"""Sigmoid focal loss (mirror of ``rsiseg/models/losses/focal_loss.py``,
the pure-pytorch branch — no compiled-ops dependency on TPU)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import weight_reduce_loss


def sigmoid_focal_loss(pred, target_onehot, one_minus_valid=None,
                       gamma=2.0, alpha=0.5, class_weight=None):
    """elementwise focal term, NHWC."""
    pred = pred.astype(jnp.float32)
    p = jax.nn.sigmoid(pred)
    pt = (1 - p) * target_onehot + p * (1 - target_onehot)
    focal_weight = (alpha * target_onehot +
                    (1 - alpha) * (1 - target_onehot)) * pt**gamma
    bce = jnp.maximum(pred, 0) - pred * target_onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = bce * focal_weight
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight, jnp.float32)
    return loss


@LOSSES.register_module()
class FocalLoss:

    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.5,
                 reduction='mean', class_weight=None, loss_weight=1.0,
                 loss_name='loss_focal'):
        assert use_sigmoid, 'only sigmoid focal loss is supported'
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.class_weight = class_weight
        self.loss_weight = loss_weight
        self._loss_name = loss_name

    @property
    def loss_name(self):
        return self._loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=255, **kwargs):
        reduction = reduction_override or self.reduction
        num_classes = pred.shape[-1]
        valid = (target != ignore_index)
        safe = jnp.where(valid, target, 0).astype(jnp.int32)
        onehot = jax.nn.one_hot(safe, num_classes) * \
            valid[..., None].astype(jnp.float32)
        loss = sigmoid_focal_loss(pred, onehot, gamma=self.gamma,
                                  alpha=self.alpha,
                                  class_weight=self.class_weight)
        loss = loss * valid[..., None].astype(jnp.float32)
        if weight is not None:
            loss = loss * weight[..., None].astype(jnp.float32)
        loss = weight_reduce_loss(loss, None, reduction, avg_factor)
        return self.loss_weight * loss
