"""End-to-end golden trace of ONE full PGSTTRG UDA iteration vs a
torch twin (round-3 extension; methodology of
``tests/test_uda_golden_trace.py``).

PGSTTRG (``rsiseg/models/uda/pgst_trg.py``) is the OTHER target
self-training branch: unlike FMDA (which jitter/blurs the plain target
in-step, ``fmda.py:309-315``), the student trains directly on the data
pipeline's strongly-augmented view ``target_img_strong_aug`` AS-IS
against the raw pseudo-labels (``pgst_trg.py:270-279``) — no
``strong_transform`` call at all, and the scalar quality-weight map
stays untransformed.  The aux tensors carry the RAW teacher features
(``x_ema=ema_feats``), the self-training pass features
(``x_trg=trg_feats``) and logits (``logits_trg=trg_logits``), and NO
``mix_masks`` (``pgst_trg.py:281-295``).

What this composed trace proves that ``tests/test_uda_variants.py``
cannot: the training input really is the pipeline strong view (the
test feeds a strong view DISTINCT from the plain target, so consuming
the wrong one shifts every ``trg.*`` log var), the teacher still sees
the plain view, and the untransformed quality weight + raw-teacher-
feature aux losses compose exactly as the reference wires them.

Same tie-avoidance setup as the FMDA trace: ``feat_level=0`` keeps the
similarity features at logits stride (no nearest-upsample value ties)
and a 255 gt border keeps zero-padded unfold neighbors out of the
masked means.
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
        type='PGSTTRG', alpha=ALPHA, pseudo_threshold=TAU,
        pseudo_weight_ignore_top=0, pseudo_weight_ignore_bottom=0,
        imnet_feature_dist_lambda=0, mix='class',
        blur=False, color_jitter_strength=0.2,
        color_jitter_probability=1.0,
        trg_loss_weight=1.0,
        aux_losses=[dict(
            type='AdaptiveFeatSimLoss', top_k=TOPK, dilation=D,
            kernel_size=K, weights=FS_WEIGHTS, sigma=SIGMA,
            feat_level=FEAT_LEVEL, sim_type='gaussian',
            apply_ignore=True)])


def torch_pgsttrg_step(student, teacher, batch, iter_idx):
    """The reference iteration ``pgst_trg.py:176-315`` on the twins."""
    img = torch.from_numpy(batch['img']).permute(0, 3, 1, 2)
    gt = torch.from_numpy(batch['gt_semantic_seg']).long()
    target_img = torch.from_numpy(batch['target_img']).permute(
        0, 3, 1, 2)
    target_strong = torch.from_numpy(
        batch['target_img_strong_aug']).permute(0, 3, 1, 2)

    a = min(1.0 - 1.0 / (iter_idx + 1), ALPHA)
    with torch.no_grad():
        for pt, ps in zip(teacher.parameters(), student.parameters()):
            pt.mul_(a).add_(ps, alpha=1.0 - a)

    log = {}
    student.train()
    teacher.train()

    # source pass (``pgst_trg.py:220-228``)
    src_feats = student.backbone(img)
    src_logits, _ = student.decode_head(src_feats)
    src_aux = student.auxiliary_head(src_feats)
    log.update(torch_ce_losses(src_logits, gt, prefix='decode.'))
    log.update(torch_ce_losses(src_aux, gt, loss_weight=0.4,
                               prefix='aux.'))

    # teacher pseudo-labels on the PLAIN target + scalar weight
    # (``pgst_trg.py:238-258``)
    with torch.no_grad():
        ema_feats = teacher.backbone(target_img)
        ema_logits_head, _ = teacher.decode_head(ema_feats)
        ema_up = F.interpolate(ema_logits_head, size=img.shape[2:],
                               mode='bilinear', align_corners=False)
        ema_softmax = torch.softmax(ema_up, dim=1)
        pseudo_prob, pseudo_label = torch.max(ema_softmax, dim=1)
        frac = float((pseudo_prob >= TAU).float().mean())
        pseudo_weight = torch.full_like(pseudo_prob, frac)

    # target self-training pass DIRECTLY on the pipeline strong view
    # (``pgst_trg.py:270-279``): no strong_transform, raw pseudo-labels,
    # untransformed weight, prefix 'trg.'
    trg_feats = student.backbone(target_strong)
    trg_logits, _ = student.decode_head(trg_feats)
    trg_aux = student.auxiliary_head(trg_feats)
    log.update(torch_ce_losses(trg_logits, pseudo_label, pseudo_weight,
                               prefix='trg.decode.'))
    log.update(torch_ce_losses(trg_aux, pseudo_label, pseudo_weight,
                               loss_weight=0.4, prefix='trg.aux.'))

    # aux losses on the raw teacher feats + self-training-pass logits
    # (``pgst_trg.py:281-295`` tensors; no mix_masks)
    tensors = dict(
        logits_trg=trg_logits.detach(),
        gt_src=gt,
        x_ema=ema_feats[FEAT_LEVEL],
        x_src=src_feats[FEAT_LEVEL].detach())
    aux = torch_adaptive(tensors, use_trg_mask=False, apply_ignore=True)
    log.update({n: float(v) for n, v in aux.items()})

    total = sum(v for n, v in log.items() if 'loss' in n)
    log['loss'] = float(total)
    return log


def test_pgsttrg_one_iteration_golden_trace():
    torch.manual_seed(1)
    student = TorchModel()
    teacher = TorchModel()
    with torch.no_grad():
        for mdl in (student, teacher):
            for m in mdl.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(2)
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        # DISTINCT strong view: consuming the wrong one is visible in
        # every trg.* log var
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

    theirs = torch_pgsttrg_step(student, teacher, batch, START_STEP)

    assert set(theirs) == set(ours), sorted(set(theirs) ^ set(ours))
    assert any(k.startswith('trg.') for k in ours)
    for k in sorted(theirs):
        np.testing.assert_allclose(
            ours[k], theirs[k], rtol=2e-3, atol=2e-3,
            err_msg=f'log var {k} diverges')

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
