"""Adversarial DA loss (mirror of
``rsiseg/models/losses/adv_loss.py:13-112``).

``__call__(discriminator_apply, tensors)`` takes a callable that runs
the discriminator (the adversarial adaptor passes a partial binding of
its disc params) so the loss itself stays parameter-free and jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import LOSSES
from .entropy_loss import prob2ent


def _bce_with_logits(pred, label: float):
    target = jnp.full_like(pred, label)
    return jnp.mean(jnp.maximum(pred, 0) - pred * target +
                    jnp.log1p(jnp.exp(-jnp.abs(pred))))


def _l1_to_label(pred, label: float):
    return jnp.mean(jnp.abs(pred - label))


@LOSSES.register_module()
class AdvLoss:

    def __init__(self, loss_type='advent', net_type='gen', weights=None,
                 **kwargs):
        self.loss_type = loss_type
        self.net_type = net_type
        self._loss_name = f'adv_loss_{loss_type}_{net_type}'
        self.weights = weights or {}

    @property
    def loss_name(self):
        return self._loss_name

    def __call__(self, discriminator, tensors):
        losses = {}
        if self.loss_type != 'advent':
            raise ValueError(self.loss_type)
        src_label, trg_label = 0.0, 1.0
        if self.net_type == 'disc':
            ent_src = prob2ent(jax.nn.softmax(
                jax.lax.stop_gradient(tensors['logits_src']).astype(
                    jnp.float32), axis=-1))
            ent_trg = prob2ent(jax.nn.softmax(
                jax.lax.stop_gradient(tensors['logits_trg']).astype(
                    jnp.float32), axis=-1))
            d_src = discriminator(ent_src)
            d_trg = discriminator(ent_trg)
            losses['loss_disc_src'] = _l1_to_label(d_src, src_label) * \
                self.weights.get('loss_disc_src', 1.0)
            losses['loss_disc_trg'] = _l1_to_label(d_trg, trg_label) * \
                self.weights.get('loss_disc_trg', 1.0)
        elif self.net_type == 'gen':
            ent_trg = prob2ent(jax.nn.softmax(
                tensors['logits_trg'].astype(jnp.float32), axis=-1))
            d_trg = discriminator(ent_trg)
            losses['loss_gen'] = _l1_to_label(d_trg, src_label) * \
                self.weights.get('loss_gen', 1.0)
        else:
            raise ValueError(self.net_type)
        return losses
