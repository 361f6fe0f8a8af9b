"""PFGST neighborhood-similarity loss (the paper's core loss).

TPU-native re-implementation of
``rsiseg/models/losses/pfgst_loss.py:13-234``.  The reference's
``nn.Unfold`` + gather pipeline materialises (B, C*k^2, H, W) tensors in
HBM; here the k^2 neighborhoods are expressed as statically-shifted
slices (``pfst_tpu/ops/unfold.py``) that XLA fuses into the similarity
reductions, and the whole loss traces into the one jitted UDA step.

Semantics preserved exactly (all shapes NHWC):
* ``downscale``: nearest interpolation of logits_trg by the factor,
  feats resized (nearest) to the logits' spatial size
  (``pfgst_loss.py:56-59``; F.interpolate default mode is nearest).
* target ignore mask: a pixel participates only if *all* k^2 neighbors
  come from the target image (mix-mask complement erosion,
  ``pfgst_loss.py:66-71``) — zero padding at borders excludes them.
* source supervised contrast on same/different-label neighbor pairs
  with mean/std or margin losses (``pfgst_loss.py:89-131``). Padded
  neighbors read as class 0, matching the reference's zero-pad unfold.
* cross-class-probability agreement p*q summed over classes; top-k
  most/least similar neighbors pulled/pushed (``pfgst_loss.py:203-234``;
  top-k list includes the center for the pos branch: ``top_k+1``).
* eps/edge guards: loss is 0 when fewer than 2 pixels are valid
  (``pfgst_loss.py:225-229``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...ops import resize, unfold_neighbors
from ..builder import LOSSES
from .utils import masked_mean, masked_std

_EPS = 1e-8


def _nearest(x, size):
    return resize(x, size=size, mode='nearest')


@LOSSES.register_module()
class PFGSTLoss:
    """Config-facing PFGST loss; ``__call__(tensors)`` -> loss dict."""

    def __init__(self,
                 top_k: Optional[int] = 3,
                 dilation: int = 2,
                 kernel_size: int = 3,
                 weights=None,
                 sigma: float = 30,
                 mean_sim: float = 0.6,
                 feat_level: Optional[int] = 2,
                 sim_type: str = 'gaussian',
                 num_bins: int = 100,
                 apply_ignore: bool = False,
                 src_perc: Optional[float] = None,
                 proj_net_cfg: Optional[dict] = None,
                 src_loss_type: str = 'mean_std',
                 margin: Sequence[float] = (0.5, 0.5),
                 detach_unfold: bool = False,
                 cross_prob_type: str = 'trg',
                 downscale: Optional[float] = None):
        self.top_k = top_k
        self.dilation = dilation
        self.kernel_size = kernel_size
        if isinstance(weights, (list, tuple)):
            weights = {'sim_pos': weights[0], 'sim_neg': weights[1],
                       'src_pos': 0.0, 'src_neg': 0.0,
                       'src_pos_std': 0.0, 'src_neg_std': 0.0}
        self.weights = dict(weights or {})
        self.sigma = sigma
        self.mean_sim = mean_sim
        self.feat_level = feat_level
        self.sim_type = sim_type
        self.num_bins = num_bins
        self.apply_ignore = apply_ignore
        self.src_perc = src_perc
        if proj_net_cfg is not None:
            raise NotImplementedError(
                'proj_net is not used by any shipped PFST config; '
                'parameterised projection belongs in the UDA module')
        self.src_loss_type = src_loss_type
        self.margin = tuple(margin)
        self.detach_unfold = detach_unfold
        self.cross_prob_type = cross_prob_type
        self.downscale = downscale

    # -- pieces ----------------------------------------------------------
    def _unfold(self, x):
        return unfold_neighbors(x, self.kernel_size, self.dilation)

    def get_sim_feat(self, x, size):
        """(feats, sim) — sim (B, H, W, k^2) (``pfgst_loss.py:181-201``).

        Dispatches to the fused Pallas kernel on TPU
        (``pfst_tpu/ops/pallas_sim.py``) so the k^2-unfolded feature
        tensor is never materialised in HBM.
        """
        from ...ops.pallas_sim import neighborhood_similarity
        feats = _nearest(x, size)
        if self.sim_type not in ('gaussian', 'cosine'):
            raise ValueError(f'unknown sim_type {self.sim_type}')
        sim = neighborhood_similarity(
            feats, self.kernel_size, self.dilation,
            sim_type=self.sim_type, sigma=float(self.sigma))
        return feats, sim

    def get_cross_prob(self, logits_trg, logits_ema):
        """sum_c p*q agreement, (B, H, W, k^2)
        (``pfgst_loss.py:142-178``)."""
        p = jax.nn.softmax(logits_trg, axis=-1)
        if self.cross_prob_type == 'trg':
            q_src = p
        elif self.cross_prob_type == 'ema':
            q_src = jax.nn.softmax(logits_ema, axis=-1)
        else:
            raise ValueError(self.cross_prob_type)
        unf_q = self._unfold(q_src)          # (B,H,W,k2,C)
        if self.detach_unfold:
            unf_q = jax.lax.stop_gradient(unf_q)
        return jnp.sum(p[:, :, :, None, :] * unf_q, axis=-1)

    def _src_perc_mean(self, sims, mask, descending):
        """Mean of the bottom (ascending) / top (descending) ``src_perc``
        fraction of masked sims (``pfgst_loss.py:98-102``)."""
        flat = sims.reshape(-1)
        m = mask.reshape(-1)
        fill = jnp.inf if not descending else -jnp.inf
        vals = jnp.where(m, flat, fill)
        order = jnp.argsort(vals if not descending else -vals)
        ranks = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0]))
        n_valid = jnp.sum(m.astype(jnp.int32))
        n_keep = (n_valid.astype(jnp.float32) * self.src_perc).astype(
            jnp.int32)
        keep = (ranks < n_keep) & m
        return masked_mean(flat, keep)

    # -- forward ----------------------------------------------------------
    def __call__(self, tensors):
        k2 = self.kernel_size**2
        logits_trg = tensors['logits_trg']      # (B,h,w,C) head res
        logits_ema = tensors.get('logits_ema')
        gt_src = tensors['gt_src']              # (B,H0,W0) int
        x_ema = tensors['x_ema']
        x_src = tensors['x_src']
        if self.feat_level is not None:
            x_ema = x_ema[self.feat_level]
            x_src = x_src[self.feat_level]
        img_trg = tensors.get('img_trg')
        mix_masks = tensors['mix_masks']        # (B,H0,W0) 1=source px

        if self.downscale is not None:
            h = int(logits_trg.shape[1] * self.downscale)
            w = int(logits_trg.shape[2] * self.downscale)
            logits_trg = _nearest(logits_trg, (h, w))
        size = (logits_trg.shape[1], logits_trg.shape[2])
        if logits_ema is not None and \
                tuple(logits_ema.shape[1:3]) != size:
            # logits_ema comes from teacher encode_decode at INPUT
            # resolution while logits_trg is head resolution — align
            # them for cross_prob_type='ema' (the reference's ema path
            # is unrunnable dev code: its view() at
            # ``pfgst_loss.py:167-168`` assumes equal shapes)
            logits_ema = _nearest(logits_ema, size)

        gt = _nearest(gt_src[..., None].astype(jnp.float32), size)
        gt = gt.astype(jnp.int32)               # (B,H,W,1)
        ignore_src = (gt[..., 0] != 255)        # (B,H,W)

        inv_mix = 1.0 - _nearest(
            mix_masks[..., None].astype(jnp.float32), size)
        inv_mix = (inv_mix > 0.5).astype(jnp.float32)
        unf_inv = self._unfold(inv_mix)         # (B,H,W,k2,1)
        ignore_trg = jnp.sum(unf_inv[..., 0], axis=-1) == k2  # (B,H,W)

        cross_prob_pos = self.get_cross_prob(logits_trg, logits_ema)
        cross_prob_neg = 1.0 - cross_prob_pos

        _, ema_sim = self.get_sim_feat(x_ema, size)
        _, src_sim = self.get_sim_feat(x_src, size)

        unf_gt = self._unfold(gt.astype(jnp.float32))[..., 0]  # (B,H,W,k2)
        center_gt = gt.astype(jnp.float32)                     # (B,H,W,1)
        pos_pair = unf_gt == center_gt
        neg_pair = unf_gt != center_gt
        src_valid = ignore_src[..., None]        # center-valid over k2

        losses = {}
        pos_mask = pos_pair & src_valid
        neg_mask = neg_pair & src_valid
        if self.src_perc is not None:
            src_pos_mean = self._src_perc_mean(src_sim, pos_mask, False)
            src_neg_mean = self._src_perc_mean(src_sim, neg_mask, True)
        else:
            src_pos_mean = masked_mean(src_sim, pos_mask)
            src_neg_mean = masked_mean(src_sim, neg_mask)

        if self.src_loss_type == 'mean_std':
            losses['loss_src_pos_mean'] = \
                -src_pos_mean * self.weights.get('src_pos', 0.0)
            losses['loss_src_neg_mean'] = \
                src_neg_mean * self.weights.get('src_neg', 0.0)
            losses['loss_src_pos_std'] = \
                masked_std(src_sim, pos_mask) * \
                self.weights.get('src_pos_std', 0.0)
            losses['loss_src_neg_std'] = \
                masked_std(src_sim, neg_mask) * \
                self.weights.get('src_neg_std', 0.0)
        elif self.src_loss_type in ('margin', 'margin2'):
            pos_h = jnp.maximum(self.margin[0] - src_sim, 0.0)
            neg_h = jnp.maximum(src_sim - self.margin[1], 0.0)
            if self.src_loss_type == 'margin2':
                pos_h, neg_h = pos_h**2, neg_h**2
            losses['loss_src_pos'] = masked_mean(pos_h, pos_mask) * \
                self.weights.get('src_pos', 0.0)
            losses['loss_src_neg'] = masked_mean(neg_h, neg_mask) * \
                self.weights.get('src_neg', 0.0)
        else:
            raise ValueError(self.src_loss_type)

        # -- target similarity pull/push -------------------------------
        valid_center = ignore_src & ignore_trg          # (B,H,W)
        if self.top_k is not None:
            top_sim, top_idx = jax.lax.top_k(ema_sim, self.top_k + 1)
            min_sim, min_idx = jax.lax.top_k(-ema_sim, self.top_k)
            min_sim = -min_sim
            cp_pos = jnp.take_along_axis(cross_prob_pos, top_idx, axis=-1)
            cp_neg = jnp.take_along_axis(cross_prob_neg, min_idx, axis=-1)
            loc_pos = top_sim * (-cp_pos)
            loc_neg = (1.0 - min_sim) * (-cp_neg)
        else:
            loc_pos = ema_sim * (-cross_prob_pos)
            loc_neg = (1.0 - ema_sim) * (-cross_prob_neg)
        vc = valid_center[..., None]
        n_valid = jnp.sum(valid_center.astype(jnp.int32))
        gate = (n_valid > 1).astype(jnp.float32)
        loss_sim_pos = masked_mean(loc_pos, vc & jnp.ones_like(
            loc_pos, bool)) * gate
        loss_sim_neg = masked_mean(loc_neg, vc & jnp.ones_like(
            loc_neg, bool)) * gate

        losses['loss_sim_pos'] = loss_sim_pos * self.weights.get(
            'sim_pos', 0.0)
        losses['loss_sim_neg'] = loss_sim_neg * self.weights.get(
            'sim_neg', 0.0)
        if img_trg is not None:
            density = 1.0 - jnp.mean(
                jax.lax.stop_gradient(ema_sim), axis=-1)[..., None]
            losses['vis|density_sim_feat'] = (img_trg, density,
                                              ignore_trg[..., None])
        return losses
