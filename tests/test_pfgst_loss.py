"""PFGST loss numeric parity vs the reference equations in torch.

The torch side below re-derives ``rsiseg/models/losses/pfgst_loss.py``
math independently (unfold -> cosine/gaussian similarity -> top-k
pull/push weighted by cross-class-probability agreement; source
same/diff-label contrast) so the JAX implementation can be checked
value-for-value.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pfst_tpu.models.losses.pfgst_loss import PFGSTLoss

WEIGHTS = {'src_pos': 0.1, 'src_neg': 0.1, 'sim_pos': 0.1,
           'sim_neg': 0.1, 'src_pos_std': 0.1, 'src_neg_std': 0.1}


def torch_pfgst(tensors_nchw, k, d, top_k, sim_type, sigma, downscale,
                weights, src_loss_type='mean_std', margin=(0.5, 0.5),
                detach_unfold=False, as_tensors=False):
    """Independent torch evaluation of the PFGST equations.

    ``detach_unfold`` mirrors ``pfgst_loss.py:147-148`` (only the
    UNFOLDED prob map detaches; the center prob stays differentiable);
    ``as_tensors=True`` keeps the loss terms as torch tensors so the
    gradient-level golden trace can backprop through them."""
    unfold = torch.nn.Unfold(kernel_size=k, padding=(k // 2) * d,
                             dilation=d)
    logits_trg = tensors_nchw['logits_trg']
    gt = tensors_nchw['gt_src'].float()
    x_ema, x_src = tensors_nchw['x_ema'], tensors_nchw['x_src']
    mix_masks = tensors_nchw['mix_masks'].float()

    if downscale is not None:
        logits_trg = F.interpolate(logits_trg, scale_factor=downscale)
    B, C, H, W = logits_trg.shape
    gt_ = F.interpolate(gt.unsqueeze(1), size=(H, W), mode='nearest')
    ignore_src = gt_ != 255

    inv_mix = 1 - mix_masks.unsqueeze(1)
    inv_mix = (F.interpolate(inv_mix, size=(H, W), mode='nearest') >
               0.5).float()
    unf_inv = unfold(inv_mix).view(B, k * k, H, W)
    ignore_trg = unf_inv.sum(1, keepdim=True) == k * k

    # cross prob (cross_prob_type='trg')
    p = torch.softmax(logits_trg, 1)
    q = unfold(p).view(B, C, k * k, H, W)
    if detach_unfold:
        q = q.detach()
    cross_pos = (p.unsqueeze(2) * q).sum(1)  # (B,k2,H,W)
    cross_neg = 1 - cross_pos

    def sim_feat(x):
        feats = F.interpolate(x, size=(H, W), mode='nearest')
        ch = feats.shape[1]
        unf = unfold(feats).view(B, ch, k * k, H, W)
        if sim_type == 'cosine':
            return F.cosine_similarity(unf, feats.unsqueeze(2), dim=1)
        dis = ((unf - feats.unsqueeze(2))**2).sum(1)
        return torch.exp(-dis / sigma**2)

    ema_sim = sim_feat(x_ema)  # (B,k2,H,W)
    src_sim = sim_feat(x_src)

    unf_gt = unfold(gt_).view(B, k * k, H, W).long()
    rep_gt = gt_.long().repeat(1, k * k, 1, 1)
    pos_pair = (unf_gt == rep_gt) & ignore_src.repeat(1, k * k, 1, 1)
    neg_pair = (unf_gt != rep_gt) & ignore_src.repeat(1, k * k, 1, 1)
    src_pos = src_sim[pos_pair]
    src_neg = src_sim[neg_pair]

    out = {}
    if src_loss_type == 'mean_std':
        out['loss_src_pos_mean'] = -src_pos.mean() * weights['src_pos']
        out['loss_src_neg_mean'] = src_neg.mean() * weights['src_neg']
        out['loss_src_pos_std'] = src_pos.std() * weights['src_pos_std']
        out['loss_src_neg_std'] = src_neg.std() * weights['src_neg_std']
    elif src_loss_type == 'margin':
        out['loss_src_pos'] = F.relu(
            margin[0] - src_pos).mean() * weights['src_pos']
        out['loss_src_neg'] = F.relu(
            src_neg - margin[1]).mean() * weights['src_neg']

    mask = ignore_src & ignore_trg
    if top_k is not None:
        top_sim, top_idx = torch.topk(ema_sim, top_k + 1, dim=1)
        min_sim, min_idx = torch.topk(ema_sim, top_k, dim=1,
                                      largest=False)
        cp = torch.gather(cross_pos, 1, top_idx)
        cn = torch.gather(cross_neg, 1, min_idx)
        loc_pos = top_sim * (-cp)
        loc_neg = (1 - min_sim) * (-cn)
    else:
        loc_pos = ema_sim * (-cross_pos)
        loc_neg = (1 - ema_sim) * (-cross_neg)
    if mask.sum() > 1:
        lp = loc_pos[mask.repeat(1, loc_pos.shape[1], 1, 1)].mean()
        ln = loc_neg[mask.repeat(1, loc_neg.shape[1], 1, 1)].mean()
    else:
        lp = torch.zeros(()); ln = torch.zeros(())
    out['loss_sim_pos'] = lp * weights['sim_pos']
    out['loss_sim_neg'] = ln * weights['sim_neg']
    if as_tensors:
        return out
    return {n: float(v) for n, v in out.items()}


def make_tensors(rng, B=2, C=6, H=16, W=16, ch=8, big=32):
    logits_trg = rng.randn(B, C, H, W).astype(np.float32)
    logits_ema = rng.randn(B, C, big, big).astype(np.float32)
    gt = rng.randint(0, C, (B, big, big)).astype(np.int64)
    gt[0, :4] = 255
    x_ema = rng.randn(B, ch, H, W).astype(np.float32)
    x_src = rng.randn(B, ch, H, W).astype(np.float32)
    # blocky mix mask so some all-target windows survive erosion
    mix = np.zeros((B, big, big), np.float32)
    mix[:, : big // 4, : big // 4] = 1
    return dict(logits_trg=logits_trg, logits_ema=logits_ema, gt_src=gt,
                x_ema=x_ema, x_src=x_src, mix_masks=mix)


def to_nhwc(t):
    return {
        'logits_trg': jnp.asarray(t['logits_trg'].transpose(0, 2, 3, 1)),
        'logits_ema': jnp.asarray(t['logits_ema'].transpose(0, 2, 3, 1)),
        'gt_src': jnp.asarray(t['gt_src'].astype(np.int32)),
        'x_ema': jnp.asarray(t['x_ema'].transpose(0, 2, 3, 1)),
        'x_src': jnp.asarray(t['x_src'].transpose(0, 2, 3, 1)),
        'mix_masks': jnp.asarray(t['mix_masks']),
    }


def to_torch(t):
    return {k: torch.from_numpy(v) if isinstance(v, np.ndarray) else v
            for k, v in t.items()}


@pytest.mark.parametrize('sim_type,top_k,downscale', [
    ('cosine', 3, 0.5),
    ('cosine', None, None),
    ('gaussian', 3, None),
])
def test_pfgst_loss_matches_reference_math(sim_type, top_k, downscale,
                                           rng):
    t = make_tensors(rng)
    loss = PFGSTLoss(top_k=top_k, dilation=2, kernel_size=3,
                     weights=WEIGHTS, sim_type=sim_type, sigma=30,
                     feat_level=None, detach_unfold=True,
                     downscale=downscale)
    ours = loss(to_nhwc(t))
    theirs = torch_pfgst(to_torch(t), k=3, d=2, top_k=top_k,
                         sim_type=sim_type, sigma=30,
                         downscale=downscale, weights=WEIGHTS)
    for name, val in theirs.items():
        np.testing.assert_allclose(float(ours[name]), val, rtol=2e-4,
                                   atol=2e-6, err_msg=name)


def test_pfgst_margin_loss(rng):
    t = make_tensors(rng)
    loss = PFGSTLoss(top_k=3, dilation=2, kernel_size=3, weights=WEIGHTS,
                     sim_type='cosine', feat_level=None,
                     src_loss_type='margin', margin=(0.5, 0.5))
    ours = loss(to_nhwc(t))
    theirs = torch_pfgst(to_torch(t), 3, 2, 3, 'cosine', 30, None,
                         WEIGHTS, src_loss_type='margin')
    for name in ('loss_src_pos', 'loss_src_neg', 'loss_sim_pos',
                 'loss_sim_neg'):
        np.testing.assert_allclose(float(ours[name]), theirs[name],
                                   rtol=2e-4, atol=2e-6, err_msg=name)


def test_pfgst_loss_cross_prob_ema_mismatched_resolution(rng):
    """cross_prob_type='ema' without downscale: logits_ema arrives at
    input resolution while logits_trg is head resolution — the loss
    must align them (the reference's ema path is unrunnable dev code
    with this shape combination)."""
    from pfst_tpu.models.losses.pfgst_loss import PFGSTLoss

    t = to_nhwc(make_tensors(rng))
    assert t['logits_ema'].shape[1] != t['logits_trg'].shape[1]
    loss = PFGSTLoss(
        kernel_size=3, dilation=1, top_k=3,
        weights={'src_pos': 0.1, 'src_neg': 0.1, 'sim_pos': 0.1,
                 'sim_neg': 0.1, 'src_pos_std': 0.1,
                 'src_neg_std': 0.1},
        sim_type='cosine', feat_level=None, detach_unfold=True,
        cross_prob_type='ema', downscale=None)
    out = loss(t)
    for name, val in out.items():
        if name.startswith('loss'):
            assert np.isfinite(float(val)), name
