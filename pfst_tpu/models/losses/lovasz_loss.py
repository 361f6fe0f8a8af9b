"""Lovasz-Softmax loss (mirror of
``rsiseg/models/losses/lovasz_loss.py``).

The Lovasz extension needs a sort over the error vector; on TPU the
per-image flattened sort is a single XLA sort — static shapes, ignored
pixels masked to zero-contribution rather than boolean-filtered.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .utils import get_class_weight


def lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    p = gt_sorted.shape[0]
    intersection = gts - jnp.cumsum(gt_sorted, 0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, 0)
    jaccard = 1.0 - intersection / union
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def _lovasz_softmax_flat_one_class(probs_c, fg, valid):
    """probs_c, fg, valid: (P,) — ignored pixels get zero error."""
    errors = jnp.abs(fg - probs_c) * valid
    # sort descending; ignored entries (error 0) sink to the end
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    fg_sorted = (fg * valid)[order]
    grad = lovasz_grad(fg_sorted)
    loss = jnp.sum(errors_sorted * grad)
    present = jnp.sum(fg * valid) > 0
    return jnp.where(present, loss, 0.0), present


def lovasz_softmax(probs, labels, classes='present', per_image=False,
                   class_weight=None, ignore_index=255):
    """probs NHWC, labels (B,H,W)."""
    num_classes = probs.shape[-1]

    def flat(p, l):
        pf = p.reshape(-1, num_classes)
        lf = l.reshape(-1)
        valid = (lf != ignore_index).astype(jnp.float32)
        total, cnt = 0.0, 0.0
        for c in range(num_classes):
            fg = (lf == c).astype(jnp.float32)
            loss_c, present = _lovasz_softmax_flat_one_class(
                pf[:, c], fg, valid)
            w = class_weight[c] if class_weight is not None else 1.0
            if classes == 'present':
                total = total + loss_c * w
                cnt = cnt + present.astype(jnp.float32)
            else:
                total = total + loss_c * w
                cnt = cnt + 1.0
        return total / jnp.maximum(cnt, 1.0)

    if per_image:
        losses = jax.vmap(flat)(probs, labels)
        return jnp.mean(losses)
    return flat(probs, labels)


@LOSSES.register_module()
class LovaszLoss:

    def __init__(self, loss_type='multi_class', classes='present',
                 per_image=False, reduction='mean', class_weight=None,
                 loss_weight=1.0, loss_name='loss_lovasz'):
        assert loss_type == 'multi_class', \
            'binary lovasz: use multi_class with 2 classes'
        self.classes = classes
        self.per_image = per_image
        self.reduction = reduction
        self.class_weight = get_class_weight(class_weight)
        self.loss_weight = loss_weight
        self._loss_name = loss_name

    @property
    def loss_name(self):
        return self._loss_name

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=255, **kwargs):
        probs = jax.nn.softmax(pred.astype(jnp.float32), axis=-1)
        loss = lovasz_softmax(probs, target, classes=self.classes,
                              per_image=self.per_image,
                              class_weight=self.class_weight,
                              ignore_index=ignore_index)
        return self.loss_weight * loss
