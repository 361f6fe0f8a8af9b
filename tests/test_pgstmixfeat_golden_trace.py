"""End-to-end golden trace of ONE full PGSTMixFeat UDA iteration vs a
torch twin (round-3 extension; methodology of
``tests/test_uda_golden_trace.py``).

PGSTMixFeat (``rsiseg/models/uda/pgst_mix_feat.py``) replaces PGST's
feature-map mask-mixing with a SECOND TEACHER FORWARD on a weak mix:
the same ClassMix masks (and the same jitter draw) applied to the
PLAIN target view — ``mixed_img_weak`` (``pgst_mix_feat.py:273-277``)
— and the aux losses consume those features
(``x_ema = mixed_ema_states['feats']``, ``:293-295``) while the
student trains on the STRONG-view blend ``mixed_img``.

The distinction this composed trace pins down (and that the
per-variant step test cannot): the second teacher forward runs on the
weak blend, not on the student's mixed image — the test feeds a strong
view DISTINCT from the plain target, so consuming the wrong blend
shifts every aux log var.

Same tie-avoidance setup as the FMDA/PGSTTRG traces: ``feat_level=0``
and a 255 gt border.
"""
import os.path as osp
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))

from test_feat_sim_loss import (  # noqa: E402
    D, K, SIGMA, TOPK, WEIGHTS as FS_WEIGHTS, torch_adaptive)
from test_uda_golden_trace import (  # noqa: E402
    ALPHA, MEAN, NUM_CLASSES, SIZE, START_STEP, STD, TAU, TorchModel,
    _convert, _merge, _model_cfg, torch_ce_losses)

from pfst_tpu.models import build_train_model  # noqa: E402

FEAT_LEVEL = 0  # stride 4 = logits stride: no upsample ties
import torch.nn.functional as F  # noqa: E402


def _uda_cfg():
    return dict(
        type='PGSTMixFeat', alpha=ALPHA, pseudo_threshold=TAU,
        pseudo_weight_ignore_top=0, pseudo_weight_ignore_bottom=0,
        imnet_feature_dist_lambda=0, mix='class',
        blur=False, color_jitter_strength=0.2,
        color_jitter_probability=1.0,
        trg_loss_weight=1.0, feat_level=FEAT_LEVEL,
        aux_losses=[dict(
            type='AdaptiveFeatSimLoss', top_k=TOPK, dilation=D,
            kernel_size=K, weights=FS_WEIGHTS, sigma=SIGMA,
            feat_level=FEAT_LEVEL, sim_type='gaussian',
            apply_ignore=True)])


def torch_pgstmixfeat_step(student, teacher, batch, mix_masks,
                           iter_idx):
    """The reference iteration ``pgst_mix_feat.py:176-350`` on the
    twins (jitter/blur disabled; ClassMix masks injected)."""
    img = torch.from_numpy(batch['img']).permute(0, 3, 1, 2)
    gt = torch.from_numpy(batch['gt_semantic_seg']).long()
    target_img = torch.from_numpy(batch['target_img']).permute(
        0, 3, 1, 2)
    target_strong = torch.from_numpy(
        batch['target_img_strong_aug']).permute(0, 3, 1, 2)
    masks = torch.from_numpy(mix_masks).float()

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

    # teacher pseudo-labels on the PLAIN target + scalar weight
    with torch.no_grad():
        ema_feats = teacher.backbone(target_img)
        ema_logits_head, _ = teacher.decode_head(ema_feats)
        ema_up = F.interpolate(ema_logits_head, size=img.shape[2:],
                               mode='bilinear', align_corners=False)
        ema_softmax = torch.softmax(ema_up, dim=1)
        pseudo_prob, pseudo_label = torch.max(ema_softmax, dim=1)
        frac = float((pseudo_prob >= TAU).float().mean())
        pseudo_weight = torch.full_like(pseudo_prob, frac)

    # ClassMix: strong blend for the student, WEAK blend for the
    # second teacher forward (``pgst_mix_feat.py:266-291``)
    m = masks.unsqueeze(1)
    mixed_img = m * img + (1 - m) * target_strong
    mixed_img_weak = m * img + (1 - m) * target_img
    mixed_lbl = (masks * gt.float() +
                 (1 - masks) * pseudo_label.float()).long()
    mixed_weight = masks * 1.0 + (1 - masks) * pseudo_weight

    # second teacher forward on the WEAK mix (``:293-295``)
    with torch.no_grad():
        mixed_ema_feats = teacher.backbone(mixed_img_weak)

    # mixed pass on the STRONG blend (``:297-305``)
    mix_feats = student.backbone(mixed_img)
    mix_logits, _ = student.decode_head(mix_feats)
    mix_aux = student.auxiliary_head(mix_feats)
    log.update(torch_ce_losses(mix_logits, mixed_lbl, mixed_weight,
                               prefix='mix.decode.'))
    log.update(torch_ce_losses(mix_aux, mixed_lbl, mixed_weight,
                               loss_weight=0.4, prefix='mix.aux.'))

    # aux losses: x_ema = the weak-mix teacher features
    # (``pgst_mix_feat.py:322-341`` tensors)
    tensors = dict(
        logits_trg=mix_logits.detach(),
        gt_src=gt,
        x_ema=mixed_ema_feats[FEAT_LEVEL],
        x_src=src_feats[FEAT_LEVEL].detach())
    aux = torch_adaptive(tensors, use_trg_mask=False, apply_ignore=True)
    log.update({n: float(v) for n, v in aux.items()})

    total = sum(v for n, v in log.items() if 'loss' in n)
    log['loss'] = float(total)
    return log


def test_pgstmixfeat_one_iteration_golden_trace():
    torch.manual_seed(8)
    student = TorchModel()
    teacher = TorchModel()
    with torch.no_grad():
        for mdl in (student, teacher):
            for m in mdl.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(10)
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        # DISTINCT strong view: a teacher forward on the wrong blend
        # is visible in every aux log var
        'target_img_strong_aug': rs.randn(2, SIZE, SIZE, 3).astype(
            np.float32),
    }
    b = 4 * K
    gt = batch['gt_semantic_seg']
    gt[:, :b] = 255
    gt[:, -b:] = 255
    gt[:, :, :b] = 255
    gt[:, :, -b:] = 255

    algo = build_train_model(dict(uda=_uda_cfg(), model=_model_cfg(),
                                  runner=dict(max_iters=100)))
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

    rng = jax.random.PRNGKey(7)
    step_fn = algo.make_train_step(
        tx, mean=MEAN, std=STD, jit=True, donate=False,
        split_compile=False)
    new_state, log_vars, _ = step_fn(state, batch, rng)
    ours = {k: float(v) for k, v in log_vars.items()}

    # re-derive the premix (same rng split): masks for the twin, plus
    # the weak/strong blends must actually differ
    updated = algo.ema_update(state, algo.alpha)
    premix = jax.jit(
        lambda e, eb, b, r: algo.teacher_and_mix(
            e, eb, b, r, jnp.asarray(MEAN, jnp.float32),
            jnp.asarray(STD, jnp.float32)))(
                updated.ema_params, updated.ema_batch_stats, batch, rng)
    mix_masks = np.asarray(premix['mix_masks'])
    assert 0.0 < mix_masks.mean() < 1.0
    assert 'mixed_img_weak' in premix
    assert not np.allclose(np.asarray(premix['mixed_img_weak']),
                           np.asarray(premix['mixed_img']))

    theirs = torch_pgstmixfeat_step(student, teacher, batch, mix_masks,
                                    START_STEP)

    assert set(theirs) == set(ours), sorted(set(theirs) ^ set(ours))
    for k in sorted(theirs):
        np.testing.assert_allclose(
            ours[k], theirs[k], rtol=2e-3, atol=2e-3,
            err_msg=f'log var {k} diverges (PGSTMixFeat)')

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
