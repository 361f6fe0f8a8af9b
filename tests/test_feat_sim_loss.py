"""FeatSim loss family numeric parity vs the reference equations.

Independent torch re-derivation of
``rsiseg/models/losses/feat_sim_loss.py`` (multi-level pull/push and
the Adaptive tensors-dict variants with source gt-pair supervision)
checked value-for-value against the JAX implementation.
"""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pfst_tpu.models.losses.feat_sim_loss import (
    AdaptiveFeatSimLoss, AdaptiveFeatSimLossV2, FeatSimLoss,
    FeatSimLossV2, MultiScaleAdaptiveFeatSimLoss)

K, D, TOPK, SIGMA = 3, 1, 2, 5.0
WEIGHTS = {'src_pos': 0.3, 'src_neg': 0.2, 'sim_pos': 0.5,
           'sim_neg': 0.4}


def _unfold(x, k=K, d=D):
    B, C, H, W = x.shape
    return torch.nn.Unfold(k, dilation=d, padding=(k // 2) * d)(x) \
        .view(B, C, k * k, H, W)


def _gauss_sim(x, size):
    feats = F.interpolate(x, size=size, mode='nearest')
    unf = _unfold(feats)
    dis = ((unf - feats.unsqueeze(2))**2).sum(1)
    return torch.exp(-dis / SIGMA**2)  # (B,k2,H,W)


def torch_adaptive(t, use_trg_mask, apply_ignore=True):
    logits_trg = t['logits_trg']
    B, C, H, W = logits_trg.shape
    gt = F.interpolate(t['gt_src'].float().unsqueeze(1), size=(H, W),
                       mode='nearest')
    ignore_src = (gt != 255) if apply_ignore else \
        torch.ones_like(gt, dtype=torch.bool)

    p = torch.softmax(logits_trg, 1)
    q = _unfold(p)
    cross_pos = (p.unsqueeze(2) * q).sum(1)   # (B,k2,H,W)
    cross_neg = 1 - cross_pos

    ema_sim = _gauss_sim(t['x_ema'], (H, W))
    src_sim = _gauss_sim(t['x_src'], (H, W))

    unf_gt = _unfold(gt).squeeze(1)           # (B,k2,H,W)
    pos_pair = unf_gt == gt
    neg_pair = unf_gt != gt
    src_pos = src_sim[pos_pair & ignore_src].mean()
    src_neg = src_sim[neg_pair & ignore_src].mean()

    _, idx_max = torch.topk(ema_sim, TOPK + 1, dim=1)
    _, idx_min = torch.topk(ema_sim, TOPK, dim=1, largest=False)
    loc_pos = torch.gather(ema_sim, 1, idx_max) * \
        (-torch.gather(cross_pos, 1, idx_max))
    loc_neg = (1 - torch.gather(ema_sim, 1, idx_min)) * \
        (-torch.gather(cross_neg, 1, idx_min))

    mask = ignore_src
    if use_trg_mask:
        inv = 1 - t['mix_masks'].float().unsqueeze(1)
        mask = mask & (F.interpolate(inv, size=(H, W),
                                     mode='nearest') > 0.5)
    return {
        'loss_src_pos': -src_pos * WEIGHTS['src_pos'],
        'loss_src_neg': src_neg * WEIGHTS['src_neg'],
        'loss_sim_pos':
            loc_pos[mask.expand(-1, TOPK + 1, -1, -1)].mean() *
            WEIGHTS['sim_pos'],
        'loss_sim_neg':
            loc_neg[mask.expand(-1, TOPK, -1, -1)].mean() *
            WEIGHTS['sim_neg'],
    }


def _tensors(seed=0, b=2, c=4, h=10, w=12, ch=6):
    rs = np.random.RandomState(seed)
    gt = rs.randint(0, c, (b, 2 * h, 2 * w)).astype(np.int32)
    gt[0, :3] = 255
    # border pixels see zero-padded neighbors whose similarities tie,
    # so torch/jax top-k pick different (equal-sim, different
    # cross-prob) neighbors there — exclude them via the ignore mask
    # to make the scalar comparison deterministic.
    gt[:, :2 * K] = 255
    gt[:, -2 * K:] = 255
    gt[:, :, :2 * K] = 255
    gt[:, :, -2 * K:] = 255
    mix = (rs.rand(b, 2 * h, 2 * w) > 0.5).astype(np.int32)
    return dict(
        logits_trg=rs.randn(b, h, w, c).astype(np.float32),
        gt_src=gt,
        # at logit resolution: nearest-upsampled features duplicate
        # values, tying neighbor sims (torch/jax break top-k ties
        # differently — same caveat as test_pfgst_loss).
        x_ema=[rs.randn(b, h, w, ch).astype(np.float32)
               for _ in range(3)],
        x_src=[rs.randn(b, h, w, ch).astype(np.float32)
               for _ in range(3)],
        mix_masks=mix,
        img_trg=rs.rand(b, 2 * h, 2 * w, 3).astype(np.float32),
    )


def _to_torch(t):
    out = dict(
        logits_trg=torch.from_numpy(
            t['logits_trg']).permute(0, 3, 1, 2),
        gt_src=torch.from_numpy(t['gt_src']),
        mix_masks=torch.from_numpy(t['mix_masks']),
    )
    out['x_ema'] = torch.from_numpy(t['x_ema'][2]).permute(0, 3, 1, 2)
    out['x_src'] = torch.from_numpy(t['x_src'][2]).permute(0, 3, 1, 2)
    return out


def _cmp(jax_losses, ref, keys):
    for k in keys:
        np.testing.assert_allclose(np.asarray(jax_losses[k]),
                                   ref[k].item(), rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_adaptive_v1_parity():
    t = _tensors()
    loss = AdaptiveFeatSimLoss(TOPK, D, K, WEIGHTS, sigma=SIGMA,
                               feat_level=2, apply_ignore=True)
    out = loss({k: (jnp.asarray(v) if not isinstance(v, list) else
                    [jnp.asarray(x) for x in v])
                for k, v in t.items()})
    ref = torch_adaptive(_to_torch(t), use_trg_mask=False)
    _cmp(out, ref, ['loss_src_pos', 'loss_src_neg', 'loss_sim_pos',
                    'loss_sim_neg'])
    assert 'vis|density_sim_feat' in out


def test_adaptive_v2_parity_and_trg_mask_differs():
    t = _tensors(seed=1)
    jt = {k: (jnp.asarray(v) if not isinstance(v, list) else
              [jnp.asarray(x) for x in v]) for k, v in t.items()}
    out2 = AdaptiveFeatSimLossV2(TOPK, D, K, WEIGHTS, sigma=SIGMA,
                                 feat_level=2, apply_ignore=True)(jt)
    ref2 = torch_adaptive(_to_torch(t), use_trg_mask=True)
    _cmp(out2, ref2, ['loss_src_pos', 'loss_src_neg', 'loss_sim_pos',
                      'loss_sim_neg'])
    out1 = AdaptiveFeatSimLoss(TOPK, D, K, WEIGHTS, sigma=SIGMA,
                               feat_level=2, apply_ignore=True)(jt)
    assert not np.allclose(np.asarray(out1['loss_sim_pos']),
                           np.asarray(out2['loss_sim_pos']))


def test_adaptive_topk_none_and_no_ignore():
    t = _tensors(seed=2)
    jt = {k: (jnp.asarray(v) if not isinstance(v, list) else
              [jnp.asarray(x) for x in v]) for k, v in t.items()}
    out = AdaptiveFeatSimLoss(None, D, K, WEIGHTS, sigma=SIGMA,
                              feat_level=2, apply_ignore=False)(jt)
    for k, v in out.items():
        if k.startswith('loss'):
            assert np.isfinite(np.asarray(v)).all(), k


def test_multiscale_suffixes():
    t = _tensors(seed=3)
    jt = {k: (jnp.asarray(v) if not isinstance(v, list) else
              [jnp.asarray(x) for x in v]) for k, v in t.items()}
    out = MultiScaleAdaptiveFeatSimLoss(
        TOPK, D, K, WEIGHTS, sigma=SIGMA, feat_level=[1, 2],
        apply_ignore=True)(jt)
    for lvl in (1, 2):
        for stem in ('loss_src_pos', 'loss_src_neg', 'loss_sim_pos',
                     'loss_sim_neg'):
            assert f'{stem}_{lvl}' in out
            assert np.isfinite(np.asarray(out[f'{stem}_{lvl}'])).all()


def _torch_featsim_v1(feats_list, logits, sigmas, weights):
    """Re-derivation of ``FeatSimLoss.forward``
    (``feat_sim_loss.py:29-102``; mmcv is unavailable so the reference
    cannot be imported — equations transcribed line-by-line)."""
    B, C, H, W = logits.shape
    p = torch.softmax(logits, 1)
    q = _unfold(p)                                 # (B,C,k2,H,W)
    cross_pos = (p.unsqueeze(2) * q).sum(1)        # :54 diag sum
    # :55 total p_i*q_j mass minus the diagonal
    total = p.sum(1).unsqueeze(1) * q.sum(1)
    cross_neg = total - cross_pos

    losses = {}
    sim_feat = None
    for idx, ori in enumerate(feats_list):
        feats = F.interpolate(ori, size=(H, W), mode='nearest')
        unf = _unfold(feats)
        dis = ((unf - feats.unsqueeze(2))**2).sum(1)
        sim_feat = torch.exp(-dis / sigmas[idx]**2)  # (B,k2,H,W)
        _, idx_max = torch.topk(sim_feat, TOPK + 1, dim=1)
        _, idx_min = torch.topk(sim_feat, TOPK, dim=1, largest=False)
        loc_pos = torch.gather(sim_feat, 1, idx_max) * \
            (-torch.gather(cross_pos, 1, idx_max))
        loc_neg = (1 - torch.gather(sim_feat, 1, idx_min)) * \
            (-torch.gather(cross_neg, 1, idx_min))
        mask = feats[:, 0] > 0                     # :89
        losses[f'loss_sim_pos_{idx}'] = \
            loc_pos[mask.unsqueeze(1).expand(-1, TOPK + 1, -1, -1)] \
            .mean() * weights[idx][0]
        losses[f'loss_sim_neg_{idx}'] = \
            loc_neg[mask.unsqueeze(1).expand(-1, TOPK, -1, -1)] \
            .mean() * weights[idx][1]
    states = dict(sim_feat=sim_feat.mean(1))       # :100
    return losses, states


def _torch_featsim_v2(sim_list, logits, weights):
    """Re-derivation of ``FeatSimLossV2.forward``
    (``feat_sim_loss.py:119-186``), incl. the explicit eye-masked
    CxC diag/off-diag split (``:132-141``)."""
    B, C, H, W = logits.shape
    p = torch.softmax(logits, 1)
    q = _unfold(p)
    # build (B,k2,H,W,C,C) exactly as :133-134 does via permute
    cm = (p.unsqueeze(4).repeat(1, 1, 1, 1, K * K).unsqueeze(2) *
          q.permute(0, 1, 3, 4, 2).unsqueeze(1))   # (B,C,C,H,W,k2)
    cm = cm.permute(0, 5, 3, 4, 1, 2)              # (B,k2,H,W,C,C)
    eye = torch.eye(C, dtype=torch.bool).view(1, 1, 1, 1, C, C) \
        .expand(B, K * K, H, W, C, C)
    cross_pos = cm[eye].view(B, K * K, H, W, -1).sum(-1)
    cross_neg = cm[~eye].view(B, K * K, H, W, -1).sum(-1)

    losses = {}
    for idx, ori in enumerate(sim_list):
        sim_feat = F.interpolate(ori, size=(H, W), mode='nearest')
        _, idx_max = torch.topk(sim_feat, TOPK + 1, dim=1)
        _, idx_min = torch.topk(sim_feat, TOPK, dim=1, largest=False)
        loc_pos = torch.gather(sim_feat, 1, idx_max) * \
            (-torch.gather(cross_pos, 1, idx_max))
        loc_neg = (1 - torch.gather(sim_feat, 1, idx_min)) * \
            (-torch.gather(cross_neg, 1, idx_min))
        mask = sim_feat[:, 0] > 0                  # :173
        losses[f'loss_sim_pos_{idx}'] = \
            loc_pos[mask.unsqueeze(1).expand(-1, TOPK + 1, -1, -1)] \
            .mean() * weights[idx][0]
        losses[f'loss_sim_neg_{idx}'] = \
            loc_neg[mask.unsqueeze(1).expand(-1, TOPK, -1, -1)] \
            .mean() * weights[idx][1]
    states = dict(sim_feat=sim_list[0].mean(1))    # :184
    return losses, states


def test_featsim_v1_torch_parity():
    """FeatSimLoss (raw-feature variant) vs the torch re-derivation.

    Feature channel 0 is forced negative on the border ring (width
    k//2*d) so the reference's own ``feats[:,0]>0`` mask excludes
    every pixel whose neighborhood touches zero padding — padded
    neighbors tie in similarity and torch/jax top-k break ties
    differently (same caveat as the Adaptive tests above)."""
    rs = np.random.RandomState(7)
    b, h, w, c, ch = 2, 10, 12, 4, 6
    logits = rs.randn(b, h, w, c).astype(np.float32)
    ring = (K // 2) * D
    feats = []
    for _ in range(2):
        f = rs.randn(b, h, w, ch).astype(np.float32)
        f[..., 0] = np.abs(f[..., 0]) + 0.1
        f[:, :ring, :, 0] = -1.0
        f[:, -ring:, :, 0] = -1.0
        f[:, :, :ring, 0] = -1.0
        f[:, :, -ring:, 0] = -1.0
        feats.append(f)
    sigmas, weights = [SIGMA, 2.0], [(0.5, 0.4), (0.3, 0.2)]

    jl, js = FeatSimLoss(TOPK, D, K, sigmas=sigmas, weights=weights)(
        [jnp.asarray(f) for f in feats], jnp.asarray(logits))
    tl, ts = _torch_featsim_v1(
        [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats],
        torch.from_numpy(logits).permute(0, 3, 1, 2), sigmas, weights)
    _cmp(jl, tl, sorted(tl))
    np.testing.assert_allclose(np.asarray(js['sim_feat']),
                               ts['sim_feat'].numpy(), rtol=1e-5,
                               atol=1e-6)


def test_featsim_v2_torch_parity():
    """FeatSimLossV2 (precomputed-similarity variant) vs torch,
    including the nearest resize of half-resolution sim maps (spatial
    resize never ties the k2 channel axis, so top-k stays
    deterministic) and the ``sim_feat[:,0]>0`` mask."""
    rs = np.random.RandomState(8)
    b, h, w, c = 2, 8, 10, 5
    logits = rs.randn(b, h, w, c).astype(np.float32)
    sims = [(rs.rand(b, h // 2, w // 2, K * K) - 0.25)
            .astype(np.float32),
            (rs.rand(b, h, w, K * K) - 0.25).astype(np.float32)]
    weights = [(0.5, 0.4), (0.3, 0.2)]

    jl, js = FeatSimLossV2(TOPK, D, K, weights=weights)(
        [jnp.asarray(s) for s in sims], jnp.asarray(logits))
    tl, ts = _torch_featsim_v2(
        [torch.from_numpy(s).permute(0, 3, 1, 2) for s in sims],
        torch.from_numpy(logits).permute(0, 3, 1, 2), weights)
    _cmp(jl, tl, sorted(tl))
    np.testing.assert_allclose(np.asarray(js['sim_feat']),
                               ts['sim_feat'].numpy(), rtol=1e-5,
                               atol=1e-6)


def test_featsim_v1_v2_smoke():
    rs = np.random.RandomState(4)
    logits = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    feats = [jnp.asarray(rs.randn(2, 4, 4, 6).astype(np.float32))]
    l1, s1 = FeatSimLoss(TOPK, D, K, sigmas=[SIGMA],
                         weights=[(0.5, 0.5)])(feats, logits)
    assert set(l1) == {'loss_sim_pos_0', 'loss_sim_neg_0'}
    assert s1['sim_feat'].shape == (2, 8, 8)
    sims = [jnp.asarray(rs.rand(2, 4, 4, K * K).astype(np.float32))]
    l2, s2 = FeatSimLossV2(TOPK, D, K,
                           weights=[(0.5, 0.5)])(sims, logits)
    assert set(l2) == {'loss_sim_pos_0', 'loss_sim_neg_0'}
    for v in list(l1.values()) + list(l2.values()):
        assert np.isfinite(np.asarray(v)).all()
