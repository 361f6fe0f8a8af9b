"""End-to-end golden trace of ONE full PFST (base) UDA iteration vs a
torch twin (round-3 extension; methodology of
``tests/test_uda_golden_trace.py``).

PFST (``rsiseg/models/uda/pfst.py:54-336``) — the repo's eponymous
algorithm — is PFGST's predecessor: same EMA-teacher + ClassMix
skeleton, but (a) the similarity losses read BACKBONE feature maps
(``x_src``/``x_ema``/``x_trg`` are the 4-level tuples,
``pfst.py:293-311``; no ``use_decoded_feats``), (b) the pseudo-weight
is always the scalar quality fraction (no ``thre_type``), and (c) the
aux tensors additionally carry the mixed-pass features
(``x_trg=mixed_feats``) and the teacher logits (``logits_ema``).

The configured aux loss is the eponymous ``PFSTLoss``
(``pfst_loss.py:12-149``): similarity-weighted neighbor-logit voting
over the teacher's features/logits — it consumes exactly the tensors
PFST uniquely provides (``x_ema`` at ``feat_level``, input-resolution
``logits_ema``, ``mix_masks``), so the composed step exercises the
full PFST tensor surface end-to-end.

Tie-avoidance: ``feat_level=0`` (stride 4 = the twin's logits stride)
keeps the similarity features at vote resolution — no nearest-upsample
value-duplication ties (the caveat on
``tests/test_pfst_loss.py::test_pfst_loss_v1_torch_parity``).
Zero-padded border neighbors tie at sim=0, but their gathered
neighbor logits are 0 too, so tied selections contribute identically
to the vote on both sides.
"""
import os.path as osp
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))

from test_pfst_loss import WEIGHTS as V1_WEIGHTS, torch_pfst_v1  # noqa: E402
from test_uda_golden_trace import (  # noqa: E402
    ALPHA, MEAN, NUM_CLASSES, SIZE, START_STEP, STD, TAU, TorchModel,
    _convert, _merge, _model_cfg, torch_ce_losses)

from pfst_tpu.models import build_train_model  # noqa: E402

import torch.nn.functional as F  # noqa: E402

FEAT_LEVEL = 0  # stride 4 = logits stride: no upsample ties
K, D, TOPK = 3, 2, 3


def _uda_cfg():
    return dict(
        type='PFST', alpha=ALPHA, pseudo_threshold=TAU,
        pseudo_weight_ignore_top=0, pseudo_weight_ignore_bottom=0,
        imnet_feature_dist_lambda=0, mix='class',
        blur=False, color_jitter_strength=0.2,
        color_jitter_probability=1.0,  # ref gate: jitter iff draw > p
        trg_loss_weight=1.0,
        aux_losses=[dict(
            type='PFSTLoss', top_k=TOPK, dilation=D, kernel_size=K,
            weights=V1_WEIGHTS, sim_type='cosine',
            feat_level=FEAT_LEVEL)])


def torch_pfst_base_step(student, teacher, batch, mix_masks, iter_idx):
    """The reference iteration ``pfst.py:176-336`` on the twins
    (jitter/blur disabled; ClassMix masks injected)."""
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

    # source pass (``pfst.py:220-229``; backbone feats kept)
    src_feats = student.backbone(img)
    src_logits, _ = student.decode_head(src_feats)
    src_aux = student.auxiliary_head(src_feats)
    log.update(torch_ce_losses(src_logits, gt, prefix='decode.'))
    log.update(torch_ce_losses(src_aux, gt, loss_weight=0.4,
                               prefix='aux.'))

    # teacher pseudo-labels + SCALAR weight (``pfst.py:245-254``);
    # encode_decode resizes logits to input size
    with torch.no_grad():
        ema_feats = teacher.backbone(target_img)
        ema_logits_head, _ = teacher.decode_head(ema_feats)
        ema_up = F.interpolate(ema_logits_head, size=img.shape[2:],
                               mode='bilinear', align_corners=False)
        ema_softmax = torch.softmax(ema_up, dim=1)
        pseudo_prob, pseudo_label = torch.max(ema_softmax, dim=1)
        frac = float((pseudo_prob >= TAU).float().mean())
        pseudo_weight = torch.full_like(pseudo_prob, frac)

    # ClassMix blend (``pfst.py:265-281``; jitter/blur disabled)
    m = masks.unsqueeze(1)
    mixed_img = m * img + (1 - m) * target_strong
    mixed_lbl = (masks * gt.float() +
                 (1 - masks) * pseudo_label.float()).long()
    mixed_weight = masks * 1.0 + (1 - masks) * pseudo_weight

    # mixed pass (``pfst.py:283-291``; backbone feats kept)
    mix_feats = student.backbone(mixed_img)
    mix_logits, _ = student.decode_head(mix_feats)
    mix_aux = student.auxiliary_head(mix_feats)
    log.update(torch_ce_losses(mix_logits, mixed_lbl, mixed_weight,
                               prefix='mix.decode.'))
    log.update(torch_ce_losses(mix_aux, mixed_lbl, mixed_weight,
                               loss_weight=0.4, prefix='mix.aux.'))

    # PFSTLoss on the PFST tensors (``pfst.py:293-322``):
    # x_ema = teacher backbone feats at feat_level, logits_ema = the
    # input-resolution teacher logits, logits_trg = mixed-pass logits
    t = dict(
        logits_trg=mix_logits.detach(),
        logits_ema=ema_up,
        x_ema=ema_feats[FEAT_LEVEL],
        mix_masks=masks)
    aux = torch_pfst_v1(t, k=K, d=D, top_k=TOPK, sim_type='cosine',
                        sigma=None, weights=V1_WEIGHTS)
    log.update({n: float(v) for n, v in aux.items()})

    total = sum(v for n, v in log.items() if 'loss' in n)
    log['loss'] = float(total)
    return log


def test_pfst_base_one_iteration_golden_trace():
    torch.manual_seed(4)
    student = TorchModel()
    teacher = TorchModel()
    with torch.no_grad():
        for mdl in (student, teacher):
            for m in mdl.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(6)
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'target_img_strong_aug': rs.randn(2, SIZE, SIZE, 3).astype(
            np.float32),
    }
    batch['gt_semantic_seg'][0, :8] = 255  # exercise the ignore path

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

    # re-derive the premix (same rng split) to extract the ClassMix
    # masks for injection into the torch twin
    updated = algo.ema_update(state, algo.alpha)
    premix = jax.jit(
        lambda e, eb, b, r: algo.teacher_and_mix(
            e, eb, b, r, jnp.asarray(MEAN, jnp.float32),
            jnp.asarray(STD, jnp.float32)))(
                updated.ema_params, updated.ema_batch_stats, batch, rng)
    mix_masks = np.asarray(premix['mix_masks'])
    assert 0.0 < mix_masks.mean() < 1.0

    theirs = torch_pfst_base_step(student, teacher, batch, mix_masks,
                                  START_STEP)

    assert set(theirs) == set(ours), sorted(set(theirs) ^ set(ours))
    for k in sorted(theirs):
        np.testing.assert_allclose(
            ours[k], theirs[k], rtol=2e-3, atol=2e-3,
            err_msg=f'log var {k} diverges (PFST base)')

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
