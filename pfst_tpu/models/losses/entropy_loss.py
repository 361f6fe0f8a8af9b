"""Entropy minimisation loss (mirror of
``rsiseg/models/losses/entropy_loss.py:13``)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..builder import LOSSES


def prob2ent(prob):
    """per-class normalised entropy map, NHWC
    (``entropy_loss.py:26-29``)."""
    c = prob.shape[-1]
    return -prob * jnp.log2(prob + 1e-30) / math.log2(c)


@LOSSES.register_module()
class EntropyLoss:

    def __init__(self, loss_type='entropy', weights=None, **kwargs):
        self.loss_type = loss_type
        self._loss_name = f'loss_{loss_type}'
        self.weights = weights or {}

    @property
    def loss_name(self):
        return self._loss_name

    def __call__(self, tensors):
        losses = {}
        prob_trg = jax.nn.softmax(
            tensors['logits_trg'].astype(jnp.float32), axis=-1)
        if self.loss_type == 'entropy':
            ent = prob2ent(prob_trg)
            losses['loss_ent'] = jnp.mean(jnp.sum(ent, axis=-1)) * \
                self.weights.get('loss_ent', 1.0)
        elif self.loss_type == 'max_square':
            losses['loss_max_square'] = -jnp.mean(prob_trg**2) / 2 * \
                self.weights.get('loss_max_square', 1.0)
        else:
            raise ValueError(self.loss_type)
        return losses
