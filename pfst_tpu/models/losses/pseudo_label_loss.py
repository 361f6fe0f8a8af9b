"""PseudoLabelLoss / LocalPseudoFeatLoss (mirrors of
``rsiseg/models/losses/{pseudo_label_loss,local_pseudo_feat_loss}.py``).

Both reference files are unrunnable development code (they contain
live ``pdb.set_trace()`` calls and reference the nonexistent
``F.cross_entropy_loss``); these implementations realise the
documented intent with the framework's tensors-dict interface so
configs naming them work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import resize, unfold_neighbors
from ..builder import LOSSES
from .cross_entropy_loss import cross_entropy
from .utils import masked_mean


@LOSSES.register_module()
class PseudoLabelLoss:
    """CE of the student's target logits against hard pseudo labels
    from the auxiliary/teacher network (``pseudo_label_loss.py:13``)."""

    def __init__(self, loss_type='entropy', weights=None, **kwargs):
        self.loss_type = loss_type
        self._loss_name = f'loss_{loss_type}'
        self.weights = weights or {}

    @property
    def loss_name(self):
        return self._loss_name

    def __call__(self, tensors):
        logits_trg = tensors['logits_trg']
        logits_ema = tensors['logits_ema']
        if logits_ema.shape[1:3] != logits_trg.shape[1:3]:
            logits_ema = resize(logits_ema,
                                size=logits_trg.shape[1:3],
                                mode='bilinear', align_corners=False)
        pseudo = jnp.argmax(jax.lax.stop_gradient(logits_ema), axis=-1)
        loss = cross_entropy(logits_trg, pseudo, ignore_index=255)
        return {'loss_pseudo': loss * self.weights.get('loss_pseudo',
                                                       1.0)}


@LOSSES.register_module()
class LocalPseudoFeatLoss:
    """Source same/diff-label similarity contrast + target local
    agreement (``local_pseudo_feat_loss.py:13``)."""

    def __init__(self, top_k, dilation, kernel_size, weights,
                 num_classes=None, sigma=30, mean_sim=0.6, feat_level=2,
                 sim_type='cosine'):
        self.top_k = top_k
        self.dilation = dilation
        self.kernel_size = kernel_size
        self.weights = weights
        self.sigma = sigma
        self.feat_level = feat_level
        self.sim_type = sim_type

    def _sim(self, x, size):
        from ..losses.pfst_loss import _sim_feat
        return _sim_feat(x, size, self.kernel_size, self.dilation,
                         self.sim_type, self.sigma)[1]

    def __call__(self, tensors):
        logits_trg = tensors['logits_trg']
        gt_src = tensors['gt_src']
        x_src = tensors['x_src']
        x_ema = tensors['x_ema']
        if self.feat_level is not None:
            x_src = x_src[self.feat_level]
            x_ema = x_ema[self.feat_level]
        b, h, w, c = logits_trg.shape
        size = (h, w)
        gt = resize(gt_src[..., None].astype(jnp.float32), size=size,
                    mode='nearest')
        valid = (gt[..., 0] != 255)[..., None]
        src_sim = self._sim(x_src, size)
        unf_gt = unfold_neighbors(gt, self.kernel_size,
                                  self.dilation)[..., 0]
        pos = (unf_gt == gt) & valid
        neg = (unf_gt != gt) & valid
        losses = {
            'loss_src_pos': -masked_mean(src_sim, pos) *
            self.weights['src_pos'],
            'loss_src_neg': masked_mean(src_sim, neg) *
            self.weights['src_neg'],
        }
        # target: pull locally-similar pixels toward agreement
        ema_sim = self._sim(x_ema, size)
        p = jax.nn.softmax(logits_trg, axis=-1)
        unf_p = unfold_neighbors(p, self.kernel_size, self.dilation)
        agree = jnp.sum(p[:, :, :, None, :] * unf_p, axis=-1)
        top_sim, top_idx = jax.lax.top_k(ema_sim, self.top_k + 1)
        top_agree = jnp.take_along_axis(agree, top_idx, axis=-1)
        losses['loss_sim_pos'] = masked_mean(
            top_sim * (-top_agree),
            jnp.ones_like(top_sim, bool)) * self.weights['sim_pos']
        return losses
