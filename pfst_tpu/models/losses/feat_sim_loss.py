"""FeatSim loss family (mirror of
``rsiseg/models/losses/feat_sim_loss.py`` — the pre-PFGST experimental
similarity regularizers).

``FeatSimLoss`` (``feat_sim_loss.py:14-102``) operates on a *list* of
feature levels against the segmentation logits: per level, the top-k
most similar neighbors are pulled by the class-agreement probability
and the least similar pushed by the cross-class mass.
``FeatSimLossV2`` (``:105-186``) consumes *precomputed* per-level
similarity maps instead of raw features.  The ``Adaptive*`` variants
(``:189-``) take the UDA ``tensors`` dict, add source-domain gt-pair
supervision, and differ only in masking:

* ``AdaptiveFeatSimLoss`` (``:189-337``): target sim losses masked by
  the (optional, ``apply_ignore``) source-gt validity only.
* ``AdaptiveFeatSimLossV2`` (``:520-661``): additionally restricts
  the target sim losses to true-target pixels (inverse ClassMix mask).
* ``AdaptiveFeatSimLossV3`` (``:664-796``) is unrunnable dev code in
  the reference (``pdb.set_trace()`` at ``:721``; undefined
  ``cross_prob_map_diag``/``top_aug_sim_feat`` in its
  ``get_sim_losses``); registered here with V2 semantics.
* ``AdaptiveFeatSimLossV4`` (``:800-942``) crashes on construction in
  the reference (``super(AdaptiveFeatSimLossV2, self)`` from a
  non-subclass, ``:805``); its forward body is byte-identical to V2,
  so it is registered with V2 semantics.
* ``MultiScaleAdaptiveFeatSimLoss`` (``:366-517``): V1 applied per
  feature level with ``_{level}``-suffixed loss keys.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops import resize, unfold_neighbors
from ..builder import LOSSES
from .utils import masked_mean


def _sim(feats, k, d, sim_type, sigma):
    """Neighborhood similarity (B,H,W,k2) of a NHWC feature map."""
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


def _topk_pull_push(sim_feat, cross_pos, cross_neg, top_k):
    """Reference ``get_sim_losses`` core (``feat_sim_loss.py:309-337``):
    pull the ``top_k+1`` most-similar neighbors by the class-agreement
    mass, push the ``top_k`` least-similar by the disagreement mass.
    ``top_k=None`` uses every neighbor."""
    if top_k is not None:
        top_sim, top_idx = jax.lax.top_k(sim_feat, top_k + 1)
        min_sim, min_idx = jax.lax.top_k(-sim_feat, top_k)
        min_sim = -min_sim
        cp = jnp.take_along_axis(cross_pos, top_idx, axis=-1)
        cn = jnp.take_along_axis(cross_neg, min_idx, axis=-1)
        loc_pos = top_sim * (-cp)
        loc_neg = (1.0 - min_sim) * (-cn)
    else:
        loc_pos = sim_feat * (-cross_pos)
        loc_neg = (1.0 - sim_feat) * (-cross_neg)
    return loc_pos, loc_neg


@LOSSES.register_module()
class FeatSimLoss:
    """Multi-level pull/push against logits (``feat_sim_loss.py:14``)."""

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
        # (feat_sim_loss.py:54-55)
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
            loc_pos, loc_neg = _topk_pull_push(
                sim_feat, cross_pos, cross_neg, self.top_k)
            mask = (feats[..., 0] > 0)[..., None]   # :89
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
class FeatSimLossV2:
    """Precomputed-similarity variant (``feat_sim_loss.py:105-186``).

    Consumes a list of similarity maps (B,h_i,w_i,k2) — e.g. the
    ``sim_feat`` states emitted by a previous step — instead of raw
    features; each is resized (nearest) to logit resolution and the
    top-k pull/push applied directly.
    """

    def __init__(self, top_k, dilation, kernel_size, sigmas=None,
                 weights=None):
        self.top_k = top_k
        self.dilation = dilation
        self.kernel_size = kernel_size
        self.sigmas = sigmas
        self.weights = weights

    def __call__(self, ori_sim_feats_list, seg_logits):
        b, h, w, c = seg_logits.shape
        k, d = self.kernel_size, self.dilation
        p = jax.nn.softmax(seg_logits, axis=-1)
        unf_p = unfold_neighbors(p, k, d)
        cross_pos = jnp.sum(p[:, :, :, None, :] * unf_p, axis=-1)
        # V2 uses the explicit CxC cross map split by the diagonal
        # (:132-141) — algebraically sum(off-diag) = total - diag.
        total = jnp.sum(p, axis=-1)[:, :, :, None] * \
            jnp.sum(unf_p, axis=-1)
        cross_neg = total - cross_pos

        losses = {}
        for idx, ori_sim in enumerate(ori_sim_feats_list):
            sim_feat = resize(ori_sim, size=(h, w), mode='nearest')
            loc_pos, loc_neg = _topk_pull_push(
                sim_feat, cross_pos, cross_neg, self.top_k)
            mask = (sim_feat[..., 0] > 0)[..., None]    # :173
            losses[f'loss_sim_pos_{idx}'] = masked_mean(
                loc_pos, jnp.broadcast_to(mask, loc_pos.shape)) * \
                self.weights[idx][0]
            losses[f'loss_sim_neg_{idx}'] = masked_mean(
                loc_neg, jnp.broadcast_to(mask, loc_neg.shape)) * \
                self.weights[idx][1]
        states = dict(sim_feat=jax.lax.stop_gradient(
            jnp.mean(ori_sim_feats_list[0], axis=-1)))
        return losses, states


@LOSSES.register_module()
class AdaptiveFeatSimLoss:
    """tensors-dict variant (``feat_sim_loss.py:189-337``).

    Source domain: gt-label-pair contrast on the student's source
    features (pull same-label neighbor similarity up, push diff-label
    down).  Target domain: top-k pull/push of the EMA features'
    similarity weighted by the student's class-(dis)agreement mass,
    masked by source-gt validity when ``apply_ignore``.
    """

    # which mask restricts the target sim losses; V2 adds the inverse
    # ClassMix mask (reference :577-579)
    use_trg_mask = False

    def __init__(self, top_k, dilation, kernel_size, weights, sigma=30,
                 mean_sim=0.6, feat_level=2, sim_type='gaussian',
                 num_bins=100, apply_ignore=False):
        self.top_k = top_k
        self.dilation = dilation
        self.kernel_size = kernel_size
        self.weights = weights
        self.sigma = sigma
        self.feat_level = feat_level
        self.sim_type = sim_type
        self.apply_ignore = apply_ignore

    def _level_losses(self, tensors, x_ema, x_src, suffix=''):
        logits_trg = tensors['logits_trg']
        gt_src = tensors['gt_src']
        img_trg = tensors.get('img_trg')
        b, h, w, c = logits_trg.shape
        k, d = self.kernel_size, self.dilation
        size = (h, w)

        gt = resize(gt_src[..., None].astype(jnp.float32), size=size,
                    mode='nearest')                       # (B,H,W,1)
        ignore_src = (gt[..., 0] != 255) if self.apply_ignore else \
            jnp.ones((b, h, w), bool)

        # class-agreement mass of the *student* target logits (:224-225
        # — note the reference computes the src map too but never uses
        # it)
        p = jax.nn.softmax(logits_trg, axis=-1)
        unf_p = unfold_neighbors(p, k, d)
        cross_pos = jnp.sum(p[:, :, :, None, :] * unf_p, axis=-1)
        cross_neg = 1.0 - cross_pos                       # :312

        ema_sim = _sim(resize(x_ema, size=size, mode='nearest'),
                       k, d, self.sim_type, self.sigma)
        src_sim = _sim(resize(x_src, size=size, mode='nearest'),
                       k, d, self.sim_type, self.sigma)

        # source gt-pair supervision (:229-241)
        unf_gt = unfold_neighbors(gt, k, d)[..., 0]       # (B,H,W,k2)
        pos_pair = unf_gt == gt
        neg_pair = unf_gt != gt
        src_valid = ignore_src[..., None]
        src_pos_mean = masked_mean(src_sim, pos_pair & src_valid)
        src_neg_mean = masked_mean(src_sim, neg_pair & src_valid)

        # target pull/push (:244, :309-337)
        valid = ignore_src
        if self.use_trg_mask:
            inv_mix = 1.0 - resize(
                tensors['mix_masks'][..., None].astype(jnp.float32),
                size=size, mode='nearest')
            trg_valid = inv_mix[..., 0] > 0.5
            valid = valid & trg_valid
        loc_pos, loc_neg = _topk_pull_push(ema_sim, cross_pos,
                                           cross_neg, self.top_k)
        vc = valid[..., None]
        loss_sim_pos = masked_mean(
            loc_pos, jnp.broadcast_to(vc, loc_pos.shape))
        loss_sim_neg = masked_mean(
            loc_neg, jnp.broadcast_to(vc, loc_neg.shape))

        losses = {
            f'loss_src_pos{suffix}':
                -src_pos_mean * self.weights['src_pos'],
            f'loss_src_neg{suffix}':
                src_neg_mean * self.weights['src_neg'],
            f'loss_sim_pos{suffix}':
                loss_sim_pos * self.weights['sim_pos'],
            f'loss_sim_neg{suffix}':
                loss_sim_neg * self.weights['sim_neg'],
        }
        if img_trg is not None:
            density = 1.0 - jnp.mean(
                jax.lax.stop_gradient(ema_sim), axis=-1)[..., None]
            vis = (img_trg, density)
            if self.use_trg_mask:
                vis = vis + ((valid[..., None]),)
            losses[f'vis|density_sim_feat{suffix}'] = vis
        return losses

    def __call__(self, tensors):
        x_ema = tensors['x_ema']
        x_src = tensors['x_src']
        if self.feat_level is not None:
            x_ema = x_ema[self.feat_level]
            x_src = x_src[self.feat_level]
        return self._level_losses(tensors, x_ema, x_src)


@LOSSES.register_module()
class AdaptiveFeatSimLossV2(AdaptiveFeatSimLoss):
    """(``feat_sim_loss.py:520-661``): V1 plus the inverse-ClassMix
    target mask on the sim losses (only true-target pixels count)."""

    use_trg_mask = True


@LOSSES.register_module()
class AdaptiveFeatSimLossV3(AdaptiveFeatSimLossV2):
    """(``feat_sim_loss.py:664``): unrunnable dev code in the
    reference (pdb breakpoint + undefined names); V2 semantics here."""


@LOSSES.register_module()
class AdaptiveFeatSimLossV4(AdaptiveFeatSimLossV2):
    """(``feat_sim_loss.py:800``): crashes on construction in the
    reference; forward body identical to V2, registered as such."""


@LOSSES.register_module()
class MultiScaleAdaptiveFeatSimLoss(AdaptiveFeatSimLoss):
    """(``feat_sim_loss.py:366-517``): V1 applied per feature level,
    loss keys suffixed ``_{level}``."""

    def __init__(self, top_k, dilation, kernel_size, weights, sigma=30,
                 mean_sim=0.6, feat_level=(2,), sim_type='gaussian',
                 num_bins=100, apply_ignore=False):
        super().__init__(top_k, dilation, kernel_size, weights,
                         sigma=sigma, mean_sim=mean_sim,
                         feat_level=None, sim_type=sim_type,
                         num_bins=num_bins, apply_ignore=apply_ignore)
        self.feat_levels = tuple(feat_level)

    def __call__(self, tensors):
        losses = {}
        for lvl in self.feat_levels:
            x_ema = tensors['x_ema'][lvl]
            x_src = tensors['x_src'][lvl]
            losses.update(self._level_losses(tensors, x_ema, x_src,
                                             suffix=f'_{lvl}'))
        return losses
