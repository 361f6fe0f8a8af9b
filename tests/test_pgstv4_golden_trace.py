"""End-to-end golden trace of ONE full PGSTV4 UDA iteration vs a
torch twin (round-3 extension; methodology of
``tests/test_uda_golden_trace.py``).

PGSTV4 (``rsiseg/models/uda/pgst_v4.py``) is PGST *without* the
ema-feature mask mixing: the aux losses consume the RAW teacher
features of the plain target view (``pgst_v4.py:321`` ``x_ema=
ema_feats`` — the ``mixed_ema_feats`` lines are commented out), while
the student still ClassMix-trains on the strong-view blend.  The trace
additionally pins ``trg_loss_weight`` scaling: the mix losses are
logged UNSCALED but enter the total scaled (``pgst_v4.py:310``
``total_loss += mix_loss * self.trg_loss_weight``) — run here at 0.5
so a missing or double-applied scale shifts the ``loss`` log var.
"""
import os.path as osp
import sys

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))

from test_pfgst_loss import WEIGHTS, torch_pfgst  # noqa: E402
from test_uda_golden_trace import (  # noqa: E402
    ALPHA, MEAN, NUM_CLASSES, SIZE, START_STEP, STD, TAU, TorchModel,
    _convert, _merge, _model_cfg, torch_ce_losses)

from pfst_tpu.models import build_train_model  # noqa: E402

FEAT_LEVEL = 2  # the reference default (``pgst_v4.py:75``)
TRG_W = 0.5


def _uda_cfg():
    return dict(
        type='PGSTV4', alpha=ALPHA, pseudo_threshold=TAU,
        pseudo_weight_ignore_top=0, pseudo_weight_ignore_bottom=0,
        imnet_feature_dist_lambda=0, mix='class',
        blur=False, color_jitter_strength=0.2,
        color_jitter_probability=1.0,
        trg_loss_weight=TRG_W, feat_level=FEAT_LEVEL,
        aux_losses=[dict(
            type='PFGSTLoss', kernel_size=3, dilation=2, top_k=3,
            weights=WEIGHTS, sim_type='cosine', feat_level=FEAT_LEVEL,
            detach_unfold=True, downscale=None)])


def torch_pgstv4_step(student, teacher, batch, mix_masks, iter_idx):
    """The reference iteration ``pgst_v4.py:173-330`` on the twins."""
    img = torch.from_numpy(batch['img']).permute(0, 3, 1, 2)
    gt = torch.from_numpy(batch['gt_semantic_seg']).long()
    target_img = torch.from_numpy(batch['target_img']).permute(
        0, 3, 1, 2)
    target_strong = torch.from_numpy(
        batch['target_img_strong_aug']).permute(0, 3, 1, 2)
    masks = torch.from_numpy(mix_masks).float()
    H, W = img.shape[2:]

    a = min(1.0 - 1.0 / (iter_idx + 1), ALPHA)
    with torch.no_grad():
        for pt, ps in zip(teacher.parameters(), student.parameters()):
            pt.mul_(a).add_(ps, alpha=1.0 - a)

    log = {}
    student.train()
    teacher.train()

    # source pass
    src_feats = student.backbone(img)
    src_logits, _ = student.decode_head(src_feats)
    src_aux = student.auxiliary_head(src_feats)
    log.update(torch_ce_losses(src_logits, gt, prefix='decode.'))
    log.update(torch_ce_losses(src_aux, gt, loss_weight=0.4,
                               prefix='aux.'))

    # teacher pseudo-labels + scalar quality weight
    with torch.no_grad():
        ema_feats = teacher.backbone(target_img)
        ema_logits_head, _ = teacher.decode_head(ema_feats)
        ema_up = F.interpolate(ema_logits_head, size=(H, W),
                               mode='bilinear', align_corners=False)
        ema_softmax = torch.softmax(ema_up, dim=1)
        pseudo_prob, pseudo_label = torch.max(ema_softmax, dim=1)
        frac = float((pseudo_prob >= TAU).float().mean())
        pseudo_weight = torch.full_like(pseudo_prob, frac)

    # ClassMix on the STRONG view (``pgst_v4.py:262``); NO feature
    # mixing anywhere
    m = masks.unsqueeze(1)
    mixed_img = m * img + (1 - m) * target_strong
    mixed_lbl = (masks * gt.float() +
                 (1 - masks) * pseudo_label.float()).long()
    mixed_weight = masks * 1.0 + (1 - masks) * pseudo_weight

    # mixed pass; losses logged UNSCALED, total scaled by TRG_W
    mix_feats = student.backbone(mixed_img)
    mix_logits, _ = student.decode_head(mix_feats)
    mix_aux = student.auxiliary_head(mix_feats)
    mix_log = {}
    mix_log.update(torch_ce_losses(mix_logits, mixed_lbl, mixed_weight,
                                   prefix='mix.decode.'))
    mix_log.update(torch_ce_losses(mix_aux, mixed_lbl, mixed_weight,
                                   loss_weight=0.4, prefix='mix.aux.'))
    log.update(mix_log)

    # aux losses on the RAW teacher features (``pgst_v4.py:321``)
    tensors = dict(
        logits_trg=mix_logits.detach(),
        gt_src=gt,
        x_ema=ema_feats[FEAT_LEVEL],
        x_src=src_feats[FEAT_LEVEL].detach(),
        mix_masks=masks)
    aux = torch_pfgst(tensors, k=3, d=2, top_k=3,
                      sim_type='cosine', sigma=None,
                      downscale=None, weights=WEIGHTS,
                      detach_unfold=True)
    log.update(aux)

    total = (sum(v for n, v in log.items()
                 if 'loss' in n and not n.startswith('mix.')) +
             TRG_W * sum(v for n, v in mix_log.items() if 'loss' in n))
    log['loss'] = float(total)
    return log


def test_pgstv4_one_iteration_golden_trace():
    torch.manual_seed(6)
    student = TorchModel()
    teacher = TorchModel()
    with torch.no_grad():
        for mdl in (student, teacher):
            for m in mdl.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(13)
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        # distinct strong view: mask-mixed x_ema or a wrong blend view
        # shifts the aux/mix log vars
        'target_img_strong_aug': rs.randn(2, SIZE, SIZE, 3).astype(
            np.float32),
    }
    batch['gt_semantic_seg'][0, :8] = 255

    algo = build_train_model(dict(uda=_uda_cfg(), model=_model_cfg(),
                                  runner=dict(max_iters=100)))
    assert algo.mix_ema_feat_level is None  # no feature mixing in V4
    tx = optax.adamw(6e-5, weight_decay=0.01)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3), tx)

    ps, bs = _convert(student)
    pt, bt = _convert(teacher)
    state = state.replace(
        params=_merge(state.params, ps),
        batch_stats=_merge(state.batch_stats, bs),
        ema_params=_merge(state.ema_params, pt),
        ema_batch_stats=_merge(state.ema_batch_stats, bt),
        step=jnp.asarray(START_STEP, jnp.int32))

    rng = jax.random.PRNGKey(21)
    step_fn = algo.make_train_step(
        tx, mean=MEAN, std=STD, jit=True, donate=False,
        split_compile=False)
    new_state, log_vars, _ = step_fn(state, batch, rng)
    ours = {k: float(v) for k, v in log_vars.items()}

    updated = algo.ema_update(state, algo.alpha)
    premix = jax.jit(
        lambda e, eb, b, r: algo.teacher_and_mix(
            e, eb, b, r, jnp.asarray(MEAN, jnp.float32),
            jnp.asarray(STD, jnp.float32)))(
                updated.ema_params, updated.ema_batch_stats, batch, rng)
    mix_masks = np.asarray(premix['mix_masks'])
    assert 0.0 < mix_masks.mean() < 1.0

    theirs = torch_pgstv4_step(student, teacher, batch, mix_masks,
                               START_STEP)

    assert set(theirs) == set(ours), sorted(set(theirs) ^ set(ours))
    for k in sorted(theirs):
        np.testing.assert_allclose(
            ours[k], theirs[k], rtol=2e-3, atol=2e-3,
            err_msg=f'log var {k} diverges (PGSTV4)')

    # post-step EMA params: a*teacher + (1-a)*student, pre-optimizer
    pt2, _ = _convert(teacher)
    want = _merge(state.ema_params, pt2)
    want_flat = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(want)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            new_state.ema_params):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want_flat[key]),
            rtol=1e-5, atol=1e-6, err_msg=f'EMA param {key}')
