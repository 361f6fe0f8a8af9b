"""PFSTLoss family numeric parity vs the reference equations in torch.

The torch side independently re-derives
``rsiseg/models/losses/pfst_loss.py`` (mmcv is not installed here so
the reference package cannot be imported; every block cites the line
it mirrors):

* ``PFSTLoss``   — similarity-weighted neighbor-logit vote pseudo
  labels, +/- BCE masked to the mix interior (``pfst_loss.py:31-149``).
* ``PFSTLossV2`` — tau-thresholded agreement pull/push on the
  cross-class-probability map + source same/diff-label similarity
  contrast (``pfst_loss.py:173-311``).
* ``PFSTLossV4`` — the reference class is a verbatim duplicate of V2
  with a broken ``super()`` call (``pfst_loss.py:339-343``); here it
  must behave exactly as V2.
"""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp
import pytest

from pfst_tpu.models.losses.pfst_loss import (PFSTLoss, PFSTLossV2,
                                              PFSTLossV4)

WEIGHTS = {'src_pos': 0.3, 'src_neg': 0.7, 'sim_pos': 0.5,
           'sim_neg': 1.3}


def _sim_feat_torch(x, size, unfold, k, sim_type, sigma):
    """``pfst_loss.py:98-118`` (get_sim_feat)."""
    feats = F.interpolate(x, size=size, mode='nearest')
    B, ch = feats.shape[:2]
    unf = unfold(feats).view(B, ch, k * k, size[0], size[1])
    if sim_type == 'cosine':
        return feats, F.cosine_similarity(unf, feats.unsqueeze(2),
                                          dim=1)
    dis = ((unf - feats.unsqueeze(2)) ** 2).sum(1)
    return feats, torch.exp(-dis / sigma ** 2)


def torch_pfst_v1(t, k, d, top_k, sim_type, sigma, weights):
    """``pfst_loss.py:31-96`` + ``:120-149`` (PFSTLoss.forward)."""
    unfold = torch.nn.Unfold(kernel_size=k, padding=(k // 2) * d,
                             dilation=d)
    logits_trg = t['logits_trg']
    B, C, H, W = logits_trg.shape
    # ignore_mask_trg = 1 - mix_masks, nearest to logits size (:45-46)
    inv_mix = 1 - t['mix_masks'].float().unsqueeze(1)
    ignore_trg = F.interpolate(inv_mix, size=(H, W),
                               mode='nearest') > 0.5
    logits_ema = F.interpolate(t['logits_ema'], size=(H, W),
                               mode='bilinear')  # :47
    unf_logits = unfold(logits_ema).view(B, C, k * k, H, W)  # :70
    _, sim = _sim_feat_torch(t['x_ema'], (H, W), unfold, k, sim_type,
                             sigma)  # :71

    # get_sim_pseudo_labels (:120-149)
    _, idx_max = torch.topk(sim, top_k + 1, dim=1)
    _, idx_min = torch.topk(sim, top_k, dim=1, largest=False)
    max_sim = torch.gather(sim, 1, idx_max)
    min_sim = torch.gather(sim, 1, idx_min)
    lp = torch.gather(unf_logits, 2,
                      idx_max.unsqueeze(1).repeat(1, C, 1, 1, 1))
    ln = torch.gather(unf_logits, 2,
                      idx_min.unsqueeze(1).repeat(1, C, 1, 1, 1))
    pl_pos = F.softmax((max_sim.unsqueeze(1) * lp).sum(2), dim=1)
    pl_neg = F.softmax((min_sim.unsqueeze(1) * ln).sum(2), dim=1)

    bce = torch.nn.BCEWithLogitsLoss(reduction='none')
    loss_pos = bce(logits_trg, pl_pos)[
        ignore_trg.repeat(1, C, 1, 1)].mean()
    loss_neg = (-bce(logits_trg, pl_neg))[
        ignore_trg.repeat(1, C, 1, 1)].mean()
    return {'loss_sim_pos': loss_pos * weights['sim_pos'],
            'loss_sim_neg': loss_neg * weights['sim_neg']}


def torch_pfst_v2(t, k, d, sim_type, sigma, tau_pos, tau_neg,
                  border_margin, weights):
    """``pfst_loss.py:173-311`` (PFSTLossV2.forward + helpers)."""
    unfold = torch.nn.Unfold(kernel_size=k, padding=(k // 2) * d,
                             dilation=d)
    logits_trg = t['logits_trg']
    B, C, H, W = logits_trg.shape
    gt_ = F.interpolate(t['gt_src'].float().unsqueeze(1), size=(H, W),
                        mode='nearest')  # :186
    ignore_src = gt_ != 255
    inv_mix = 1 - t['mix_masks'].float().unsqueeze(1)
    ignore_trg = F.interpolate(inv_mix, size=(H, W),
                               mode='nearest') > 0.5  # :190-191

    # get_cross_prob_map_diag (:232-247): p*q summed over classes
    p = F.softmax(logits_trg, dim=1)
    q = unfold(p).view(B, C, k * k, H, W).permute(0, 1, 3, 4, 2)
    cross = (p.unsqueeze(4) * q)  # (B,C,H,W,k2)

    _, ema_sim = _sim_feat_torch(t['x_ema'], (H, W), unfold, k,
                                 sim_type, sigma)
    _, src_sim = _sim_feat_torch(t['x_src'], (H, W), unfold, k,
                                 sim_type, sigma)

    # source same/diff-label contrast, CENTER-pixel validity (:198-210)
    unf_gt = unfold(gt_).view(B, k * k, H, W).long()
    rep_gt = gt_.repeat(1, k * k, 1, 1)
    pos_pair = unf_gt == rep_gt
    neg_pair = unf_gt != rep_gt
    rep_ign = ignore_src.repeat(1, k * k, 1, 1)
    src_pos = src_sim[pos_pair & rep_ign]
    src_neg = src_sim[neg_pair & rep_ign]

    # get_sim_losses (:271-311)
    pred = logits_trg.max(dim=1)[1].unsqueeze(1)
    unf_pred = unfold(pred.float()).view(B, k * k, H, W).long()
    pos_pred = unf_pred == pred.repeat(1, k * k, 1, 1)
    neg_pred = unf_pred != pred.repeat(1, k * k, 1, 1)
    cross_pos = cross.sum(1).permute(0, 3, 1, 2)  # (B,k2,H,W) :282
    pos_mask = (ema_sim < tau_pos) & pos_pred
    neg_mask = (ema_sim > tau_neg) & neg_pred
    valid = (ignore_src & ignore_trg).float()
    unf_valid = unfold(valid).view(B, k * k, H, W).long()
    eroded = unf_valid.sum(1).unsqueeze(1) == k * k  # :294
    if border_margin is not None:
        # corner-only quirk mirrored verbatim (:295-297)
        m = border_margin
        eroded[:, :, :m, :m] = False
        eroded[:, :, -m:, -m:] = False
    pos_mask = pos_mask & eroded
    neg_mask = neg_mask & eroded
    loss_sim_pos = (cross_pos[pos_mask].mean()
                    if pos_mask.sum() > 0 else torch.zeros(()))
    loss_sim_neg = (-cross_pos[neg_mask].mean()
                    if neg_mask.sum() > 0 else torch.zeros(()))
    return {'loss_src_pos': -src_pos.mean() * weights['src_pos'],
            'loss_src_neg': src_neg.mean() * weights['src_neg'],
            'loss_sim_pos': loss_sim_pos * weights['sim_pos'],
            'loss_sim_neg': loss_sim_neg * weights['sim_neg']}


def _make_tensors(seed=0, B=2, C=6, H=16, W=16, cf=8, hf=8, wf=8):
    rs = np.random.RandomState(seed)
    t = {
        'logits_trg': rs.randn(B, C, H, W).astype(np.float32),
        'logits_ema': rs.randn(B, C, hf, wf).astype(np.float32),
        'x_ema': rs.randn(B, cf, hf, wf).astype(np.float32),
        'x_src': rs.randn(B, cf, hf, wf).astype(np.float32),
        'gt_src': np.where(rs.rand(B, 2 * H, 2 * W) < 0.15, 255,
                           rs.randint(0, C, (B, 2 * H, 2 * W))
                           ).astype(np.int32),
        'mix_masks': (rs.rand(B, 2 * H, 2 * W) < 0.4).astype(
            np.int32),
    }
    torch_t = {k: torch.from_numpy(v.astype(
        np.float32 if k not in ('gt_src', 'mix_masks') else v.dtype))
        for k, v in t.items()}
    jax_t = {
        'logits_trg': jnp.asarray(
            t['logits_trg'].transpose(0, 2, 3, 1)),
        'logits_ema': jnp.asarray(
            t['logits_ema'].transpose(0, 2, 3, 1)),
        # feat_level=None exercises the raw-tensor branch
        'x_ema': jnp.asarray(t['x_ema'].transpose(0, 2, 3, 1)),
        'x_src': jnp.asarray(t['x_src'].transpose(0, 2, 3, 1)),
        'gt_src': jnp.asarray(t['gt_src']),
        'mix_masks': jnp.asarray(t['mix_masks']),
    }
    return torch_t, jax_t


@pytest.mark.parametrize('sim_type,sigma,d', [('cosine', 30.0, 1),
                                              ('gaussian', 2.0, 2)])
def test_pfst_loss_v1_torch_parity(sim_type, sigma, d):
    # dilation-1 windows on nearest-UPSAMPLED features hit duplicated
    # 2x2 blocks -> neighbor sims of exactly 1.0 tie with the center,
    # and top-k tie order is unspecified in the reference (CUDA topk)
    # as well; use full-res features there so the vote is tie-free.
    hf = 16 if d == 1 else 8
    torch_t, jax_t = _make_tensors(seed=42, hf=hf, wf=hf)
    k, top_k = 3, 4
    ref = torch_pfst_v1(torch_t, k, d, top_k, sim_type, sigma,
                        WEIGHTS)
    loss = PFSTLoss(top_k=top_k, dilation=d, kernel_size=k,
                    weights=WEIGHTS, sigma=sigma, feat_level=None,
                    sim_type=sim_type)
    ours = loss(jax_t)
    for key, want in ref.items():
        got = float(ours[key])
        assert np.isfinite(got)
        assert abs(got - float(want)) < 2e-5, \
            f'{key}: {got} vs {want}'


@pytest.mark.parametrize('sim_type,sigma,border', [
    ('gaussian', 2.0, None), ('cosine', 30.0, 3)])
def test_pfst_loss_v2_torch_parity(sim_type, sigma, border):
    torch_t, jax_t = _make_tensors(seed=7)
    k, d = 3, 2
    tau_pos, tau_neg = 0.6, 0.4  # keep both masks populated
    ref = torch_pfst_v2(torch_t, k, d, sim_type, sigma, tau_pos,
                        tau_neg, border, WEIGHTS)
    loss = PFSTLossV2(top_k=4, dilation=d, kernel_size=k,
                      weights=WEIGHTS, sigma=sigma, feat_level=None,
                      sim_type=sim_type, tau_pos=tau_pos,
                      tau_neg=tau_neg, border_margin=border)
    ours = loss(jax_t)
    for key, want in ref.items():
        got = float(ours[key])
        assert np.isfinite(got)
        assert abs(got - float(want)) < 2e-5, \
            f'{key}: {got} vs {want}'


def test_pfst_loss_v2_empty_masks_zero_losses():
    """``pfst_loss.py:302-309``: empty threshold masks yield exactly 0
    (the reference guards the mean with ``sum() > 0``)."""
    _, jax_t = _make_tensors(seed=3)
    loss = PFSTLossV2(top_k=4, dilation=1, kernel_size=3,
                      weights=WEIGHTS, sigma=2.0, feat_level=None,
                      sim_type='gaussian', tau_pos=-1.0, tau_neg=2.0)
    out = loss(jax_t)
    assert float(out['loss_sim_pos']) == 0.0
    assert float(out['loss_sim_neg']) == 0.0


def test_pfst_loss_v4_is_v2():
    """Reference V4 duplicates V2 verbatim (``pfst_loss.py:339``)."""
    _, jax_t = _make_tensors(seed=11)
    kw = dict(top_k=4, dilation=1, kernel_size=3, weights=WEIGHTS,
              sigma=2.0, feat_level=None, sim_type='gaussian')
    v2, v4 = PFSTLossV2(**kw)(jax_t), PFSTLossV4(**kw)(jax_t)
    for key in v2:
        if key.startswith('vis|'):
            continue
        assert float(v2[key]) == float(v4[key])


def test_pfst_loss_v1_feat_level_and_vis():
    """feat_level indexes the feature list; img_trg triggers the
    ``vis|`` outputs (``pfst_loss.py:89-92``)."""
    # full-res features: see the tie note on the V1 parity test
    torch_t, jax_t = _make_tensors(seed=5, hf=16, wf=16)
    jax_t = dict(jax_t)
    jax_t['x_ema'] = [None, None, jax_t['x_ema']]
    jax_t['img_trg'] = jnp.zeros((2, 32, 32, 3))
    loss = PFSTLoss(top_k=2, dilation=1, kernel_size=3,
                    weights=WEIGHTS, sigma=30.0, feat_level=2,
                    sim_type='cosine')
    out = loss(jax_t)
    ref = torch_pfst_v1(torch_t, 3, 1, 2, 'cosine', 30.0, WEIGHTS)
    assert abs(float(out['loss_sim_pos']) -
               float(ref['loss_sim_pos'])) < 2e-5
    assert 'vis|density_sim_feat' in out
    assert 'vis|seg_mask_sim_pseudo_labels' in out
