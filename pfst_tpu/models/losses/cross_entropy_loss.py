"""Cross-entropy losses with mmseg-compatible semantics.

Mirrors ``rsiseg/models/losses/cross_entropy_loss.py``: per-pixel CE
with ``ignore_index`` zeros (NOT dropped), class weights, elementwise
pixel weights, and the legacy default of averaging over *all* pixels
including ignored ones unless ``avg_non_ignore=True`` — loss-scale
parity with the reference depends on this.

Logits are NHWC ``(B, H, W, C)``; labels ``(B, H, W)`` int32.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import get_class_weight, weight_reduce_loss


def cross_entropy(pred: jnp.ndarray,
                  label: jnp.ndarray,
                  weight: Optional[jnp.ndarray] = None,
                  class_weight: Optional[jnp.ndarray] = None,
                  reduction: str = 'mean',
                  avg_factor=None,
                  ignore_index: int = -100,
                  avg_non_ignore: bool = False) -> jnp.ndarray:
    """Softmax CE (reference ``cross_entropy_loss.py:12-65``)."""
    num_classes = pred.shape[-1]
    valid = (label != ignore_index) & (label >= 0) & (label < num_classes)
    safe_label = jnp.where(valid, label, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(pred.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_label[..., None],
                               axis=-1)[..., 0]
    if class_weight is not None:
        cw = jnp.asarray(class_weight, jnp.float32)[safe_label]
        nll = nll * cw
    loss = jnp.where(valid, nll, 0.0)
    if (avg_factor is None) and avg_non_ignore and reduction == 'mean':
        avg_factor = jnp.sum(valid.astype(jnp.float32))
    if weight is not None:
        weight = weight.astype(jnp.float32)
    return weight_reduce_loss(loss, weight=weight, reduction=reduction,
                              avg_factor=avg_factor)


def binary_cross_entropy(pred: jnp.ndarray,
                         label: jnp.ndarray,
                         weight: Optional[jnp.ndarray] = None,
                         reduction: str = 'mean',
                         avg_factor=None,
                         class_weight=None,
                         ignore_index: int = -100,
                         avg_non_ignore: bool = False,
                         **kwargs) -> jnp.ndarray:
    """Sigmoid BCE (reference ``cross_entropy_loss.py:91-160``).

    ``pred`` is NHWC with C in {1, num_classes}; with C==1 the label is
    used as a binary target directly.
    """
    pred = pred.astype(jnp.float32)
    if pred.shape[-1] == 1:
        pred = pred[..., 0]
        valid = (label != ignore_index)
        target = jnp.where(valid, label, 0).astype(jnp.float32)
        loss = jnp.maximum(pred, 0) - pred * target + \
            jnp.log1p(jnp.exp(-jnp.abs(pred)))
        loss = jnp.where(valid, loss, 0.0)
        if (avg_factor is None) and avg_non_ignore and reduction == 'mean':
            avg_factor = jnp.sum(valid.astype(jnp.float32))
        if weight is not None:
            weight = weight.astype(jnp.float32)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)
    if label.shape == pred.shape and jnp.issubdtype(
            jnp.asarray(label).dtype, jnp.floating):
        # multi-hot float target of the SAME shape (e.g. EncNet's
        # image-level class-presence SE target): plain BCE-with-logits,
        # matching torch F.binary_cross_entropy_with_logits
        target = jnp.asarray(label, jnp.float32)
        loss = jnp.maximum(pred, 0) - pred * target + \
            jnp.log1p(jnp.exp(-jnp.abs(pred)))
        if class_weight is not None:
            loss = loss * jnp.asarray(class_weight, jnp.float32)
        if weight is not None:
            weight = weight.astype(jnp.float32)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)
    # one-hot expansion path
    num_classes = pred.shape[-1]
    valid = (label >= 0) & (label != ignore_index)
    safe = jnp.where(valid, label, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe, num_classes) * \
        valid[..., None].astype(jnp.float32)
    loss = jnp.maximum(pred, 0) - pred * onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight, jnp.float32)
    loss = loss * valid[..., None].astype(jnp.float32)
    if weight is not None:
        weight = weight[..., None].astype(jnp.float32)
    if (avg_factor is None) and avg_non_ignore and reduction == 'mean':
        avg_factor = jnp.sum(valid.astype(jnp.float32)) * num_classes
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


@LOSSES.register_module()
class CrossEntropyLoss:
    """Config-facing CE loss (``cross_entropy_loss.py:199``)."""

    def __init__(self,
                 use_sigmoid: bool = False,
                 use_mask: bool = False,
                 reduction: str = 'mean',
                 class_weight: Optional[Sequence[float]] = None,
                 loss_weight: float = 1.0,
                 loss_name: str = 'loss_ce',
                 avg_non_ignore: bool = False):
        assert not use_mask, 'mask CE is instance-seg only'
        self.use_sigmoid = use_sigmoid
        self.reduction = reduction
        self.class_weight = get_class_weight(class_weight)
        self.loss_weight = loss_weight
        self.avg_non_ignore = avg_non_ignore
        self._loss_name = loss_name
        self.criterion = binary_cross_entropy if use_sigmoid \
            else cross_entropy

    @property
    def loss_name(self):
        return self._loss_name

    def __call__(self, pred, label, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=-100, **kwargs):
        reduction = reduction_override or self.reduction
        loss = self.criterion(
            pred, label, weight,
            class_weight=self.class_weight,
            reduction=reduction,
            avg_factor=avg_factor,
            ignore_index=ignore_index,
            avg_non_ignore=self.avg_non_ignore)
        return self.loss_weight * loss
