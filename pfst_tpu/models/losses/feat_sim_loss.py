"""FeatSim loss family (mirror of
``rsiseg/models/losses/feat_sim_loss.py`` — the pre-PFGST experimental
similarity regularizers).

``FeatSimLoss`` (``feat_sim_loss.py:14-102``) operates on a *list* of
feature levels against the segmentation logits: per level, the top-k
most similar neighbors are pulled by the class-agreement probability
and the least similar pushed by the cross-class mass.  The adaptive
variants (``:189-``) take the UDA ``tensors`` dict and a single
feat_level.  V2/V3/V4 in the reference are incremental experiments on
masking details; they share this machinery and are registered as
documented aliases.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import resize, unfold_neighbors
from ..builder import LOSSES
from .utils import masked_mean


def _sim(feats, k, d, sim_type, sigma):
    unf = unfold_neighbors(feats, k, d)
    center = feats[:, :, :, None, :]
    if sim_type == 'gaussian':
        return jnp.exp(-jnp.sum((unf - center)**2, axis=-1) / sigma**2)
    if sim_type == 'cosine':
        num = jnp.sum(unf * center, axis=-1)
        na = jnp.sqrt(jnp.sum(unf**2, axis=-1))
        nb = jnp.sqrt(jnp.sum(center**2, axis=-1))
        return num / jnp.maximum(na * nb, 1e-8)
    raise ValueError(sim_type)


@LOSSES.register_module()
class FeatSimLoss:

    def __init__(self, top_k, dilation, kernel_size, sigmas, weights,
                 sim_type='gaussian'):
        self.top_k = top_k
        self.dilation = dilation
        self.kernel_size = kernel_size
        self.sigmas = sigmas
        self.weights = weights
        self.sim_type = sim_type

    def __call__(self, ori_feats_list, seg_logits):
        """feats list of (B,h_i,w_i,C_i); seg_logits (B,H,W,C)."""
        b, h, w, c = seg_logits.shape
        k, d = self.kernel_size, self.dilation
        p = jax.nn.softmax(seg_logits, axis=-1)
        unf_p = unfold_neighbors(p, k, d)           # (B,H,W,k2,C)
        cross_pos = jnp.sum(p[:, :, :, None, :] * unf_p, axis=-1)
        # total mass p_i * q_j over all class pairs minus the diagonal
        total = jnp.sum(p, axis=-1)[:, :, :, None] * \
            jnp.sum(unf_p, axis=-1)
        cross_neg = total - cross_pos

        losses = {}
        sim_feat = None
        for idx, ori in enumerate(ori_feats_list):
            feats = resize(ori, size=(h, w), mode='nearest')
            sim_feat = _sim(feats, k, d, self.sim_type,
                            self.sigmas[idx] if self.sim_type ==
                            'gaussian' else 1.0)
            top_sim, top_idx = jax.lax.top_k(sim_feat, self.top_k + 1)
            min_sim, min_idx = jax.lax.top_k(-sim_feat, self.top_k)
            min_sim = -min_sim
            cp = jnp.take_along_axis(cross_pos, top_idx, axis=-1)
            cn = jnp.take_along_axis(cross_neg, min_idx, axis=-1)
            loc_pos = top_sim * (-cp)
            loc_neg = (1 - min_sim) * (-cn)
            mask = (feats[..., 0] > 0)[..., None]
            losses[f'loss_sim_pos_{idx}'] = masked_mean(
                loc_pos, jnp.broadcast_to(mask, loc_pos.shape)) * \
                self.weights[idx][0]
            losses[f'loss_sim_neg_{idx}'] = masked_mean(
                loc_neg, jnp.broadcast_to(mask, loc_neg.shape)) * \
                self.weights[idx][1]
        states = dict(sim_feat=jax.lax.stop_gradient(
            jnp.mean(sim_feat, axis=-1)))
        return losses, states


@LOSSES.register_module()
class AdaptiveFeatSimLoss:
    """tensors-dict variant (``feat_sim_loss.py:189``): single feature
    level, masks from gt/mix-mask like the PFGST loss."""

    def __init__(self, top_k, dilation, kernel_size, weights, sigma=30,
                 mean_sim=0.6, feat_level=2, sim_type='gaussian',
                 **kwargs):
        self.top_k = top_k
        self.dilation = dilation
        self.kernel_size = kernel_size
        self.weights = weights
        self.sigma = sigma
        self.feat_level = feat_level
        self.sim_type = sim_type

    def __call__(self, tensors):
        logits_trg = tensors['logits_trg']
        x_ema = tensors['x_ema']
        if self.feat_level is not None:
            x_ema = x_ema[self.feat_level]
        b, h, w, c = logits_trg.shape
        k, d = self.kernel_size, self.dilation
        size = (h, w)

        inv_mix = (1.0 - resize(
            tensors['mix_masks'][..., None].astype(jnp.float32),
            size=size, mode='nearest'))[..., 0] > 0.5
        unf_valid = unfold_neighbors(
            inv_mix[..., None].astype(jnp.float32), k, d)[..., 0]
        eroded = jnp.sum(unf_valid, axis=-1) == k * k

        p = jax.nn.softmax(logits_trg, axis=-1)
        unf_p = unfold_neighbors(p, k, d)
        cross_pos = jnp.sum(p[:, :, :, None, :] * unf_p, axis=-1)
        cross_neg = 1.0 - cross_pos

        feats = resize(x_ema, size=size, mode='nearest')
        sim_feat = _sim(feats, k, d, self.sim_type, self.sigma)
        top_sim, top_idx = jax.lax.top_k(sim_feat, self.top_k + 1)
        min_sim, min_idx = jax.lax.top_k(-sim_feat, self.top_k)
        min_sim = -min_sim
        cp = jnp.take_along_axis(cross_pos, top_idx, axis=-1)
        cn = jnp.take_along_axis(cross_neg, min_idx, axis=-1)
        loc_pos = top_sim * (-cp)
        loc_neg = (1 - min_sim) * (-cn)
        m = eroded[..., None]
        w_pos, w_neg = (self.weights['sim_pos'],
                        self.weights['sim_neg']) \
            if isinstance(self.weights, dict) else (self.weights[0],
                                                    self.weights[1])
        return {
            'loss_sim_pos': masked_mean(
                loc_pos, jnp.broadcast_to(m, loc_pos.shape)) * w_pos,
            'loss_sim_neg': masked_mean(
                loc_neg, jnp.broadcast_to(m, loc_neg.shape)) * w_neg,
        }


@LOSSES.register_module()
class FeatSimLossV2(FeatSimLoss):
    """V2 (``feat_sim_loss.py:105``): consumes precomputed similarity
    maps; here shares FeatSimLoss machinery."""


@LOSSES.register_module()
class AdaptiveFeatSimLossV2(AdaptiveFeatSimLoss):
    """(``feat_sim_loss.py:520``)."""


@LOSSES.register_module()
class AdaptiveFeatSimLossV3(AdaptiveFeatSimLoss):
    """(``feat_sim_loss.py:664``)."""


@LOSSES.register_module()
class AdaptiveFeatSimLossV4(AdaptiveFeatSimLoss):
    """(``feat_sim_loss.py:800``)."""


@LOSSES.register_module()
class MultiScaleAdaptiveFeatSimLoss:
    """(``feat_sim_loss.py:366``): AdaptiveFeatSimLoss over several
    feature levels, losses suffixed per level."""

    def __init__(self, feat_levels=(0, 1, 2, 3), **kwargs):
        kwargs.pop('feat_level', None)
        self.inner = [
            AdaptiveFeatSimLoss(feat_level=lvl, **kwargs)
            for lvl in feat_levels
        ]
        self.feat_levels = feat_levels

    def __call__(self, tensors):
        losses = {}
        for lvl, loss in zip(self.feat_levels, self.inner):
            out = loss(tensors)
            losses.update({f'{k}_{lvl}': v for k, v in out.items()})
        return losses
