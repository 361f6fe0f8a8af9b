"""End-to-end golden trace of ONE full PFSTV4 UDA iteration vs a torch
twin — the output-side-replay variant (round-3 extension of the PFGST
trace, same methodology as ``tests/test_uda_golden_trace.py``).

Composes the step the reference executes in
``rsiseg/models/uda/pfst_v4.py:177-349``: EMA teacher update -> source
supervised pass -> teacher forward on the UN-AUGMENTED target view
``target_img_ori`` -> per-sample ``transform_by_metas`` replay of the
recorded rot90/flips onto the teacher's output logits (scale 1) and the
``feat_level`` feature map (``pfst_v4.py:250-258``) -> confidence
pseudo-labels with the scalar ('all') quality weight
(``pfst_v4.py:262-268``) -> ClassMix blend -> mixed-pass training
scaled by ``trg_loss_weight`` (``pfst_v4.py:301``, exercised here at
0.5 so the weighting is visible in the total) -> the PFSTLoss
similarity-vote aux losses (``pfst_loss.py:31-149``) — in BOTH
frameworks on identical weights, inputs and injected ClassMix masks.

What the per-component tests cannot see and this trace can: the replay
feeding the pseudo-labels AND the similarity loss consistently, the
scalar pseudo-weight flowing through the mix blend, and the
``trg_loss_weight`` entering the total but not the per-loss log vars.

Randomness removal and BN-threading notes as in the PFGST trace
(``tests/test_uda_golden_trace.py`` module docstring).
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

from test_pfst_loss import WEIGHTS, torch_pfst_v1  # noqa: E402
from test_uda_golden_trace import (  # noqa: E402
    ALPHA, MEAN, NUM_CLASSES, SIZE, START_STEP, STD, TAU, TorchModel,
    _convert, _merge, _model_cfg, torch_ce_losses)

from pfst_tpu.models import build_train_model  # noqa: E402

TRG_LOSS_WEIGHT = 0.5
FEAT_LEVEL = 2


def _uda_cfg():
    return dict(
        type='PFSTV4', alpha=ALPHA, pseudo_threshold=TAU,
        pseudo_weight_ignore_top=0, pseudo_weight_ignore_bottom=0,
        imnet_feature_dist_lambda=0, mix='class',
        blur=False, color_jitter_strength=0.2,
        color_jitter_probability=1.0,  # ref gate: jitter iff draw > p
        trg_loss_weight=TRG_LOSS_WEIGHT, feat_level=FEAT_LEVEL,
        aux_losses=[dict(
            type='PFSTLoss', kernel_size=3, dilation=2, top_k=3,
            weights=WEIGHTS, sim_type='cosine', sigma=30.0,
            feat_level=FEAT_LEVEL)])


def _np_replay(x, k, fv, fh):
    """The data pipeline's geometric aug on one (H, W, C) sample:
    rot90 then flips — the ops ``transform_by_metas`` replays
    (``pfst_transforms.py:30-39``)."""
    x = np.rot90(x, k, axes=(0, 1))
    if fv:
        x = x[::-1, :, :]
    if fh:
        x = x[:, ::-1, :]
    return np.ascontiguousarray(x)


def _torch_replay(x, k, fv, fh):
    """transform_by_metas on one (1, C, H, W) tensor — rot90 in the
    (H, W) plane, then vertical/horizontal flips, the order the
    reference replays (``pfst_transforms.py:30-39``)."""
    x = torch.rot90(x, int(k), dims=[2, 3])
    if fv:
        x = x.flip(dims=[2])
    if fh:
        x = x.flip(dims=[3])
    return x


def torch_pfstv4_step(student, teacher, batch, mix_masks, iter_idx):
    """The reference iteration ``pfst_v4.py:177-349`` on the twins."""
    img = torch.from_numpy(batch['img']).permute(0, 3, 1, 2)
    gt = torch.from_numpy(batch['gt_semantic_seg']).long()
    ori = torch.from_numpy(batch['target_img_ori']).permute(0, 3, 1, 2)
    target_strong = torch.from_numpy(
        batch['target_img_strong_aug']).permute(0, 3, 1, 2)
    masks = torch.from_numpy(mix_masks).float()          # (B,H,W)
    B = img.shape[0]

    # EMA update (``pfst_v4.py:114-126``): parameters only
    a = min(1.0 - 1.0 / (iter_idx + 1), ALPHA)
    with torch.no_grad():
        for pt, ps in zip(teacher.parameters(), student.parameters()):
            pt.mul_(a).add_(ps, alpha=1.0 - a)

    log = {}
    student.train()
    teacher.train()

    # source pass (``pfst_v4.py:221-229``)
    src_logits, _, src_aux = student(img)
    log.update(torch_ce_losses(src_logits, gt, prefix='decode.'))
    log.update(torch_ce_losses(src_aux, gt, loss_weight=0.4,
                               prefix='aux.'))

    # teacher on the CLEAN view + output-side replay
    # (``pfst_v4.py:249-258``); encode_decode upsamples to input size
    # before the scale-1 replay
    with torch.no_grad():
        feats_ori = teacher.backbone(ori)
        ema_logits_head, _ = teacher.decode_head(feats_ori)
        ema_up = F.interpolate(ema_logits_head, size=img.shape[2:],
                               mode='bilinear', align_corners=False)
        f_lvl = feats_ori[FEAT_LEVEL].clone()
        for i in range(B):
            k = int(batch['rotate_k'][i])
            fv = int(batch['flip_vertical'][i])
            fh = int(batch['flip_horizontal'][i])
            ema_up[i:i + 1] = _torch_replay(ema_up[i:i + 1], k, fv, fh)
            f_lvl[i:i + 1] = _torch_replay(f_lvl[i:i + 1], k, fv, fh)

        # pseudo-labels + SCALAR quality weight (``pfst_v4.py:262-268``
        # — the PFST family has no thre_type knob; always 'all')
        ema_softmax = torch.softmax(ema_up, dim=1)
        pseudo_prob, pseudo_label = torch.max(ema_softmax, dim=1)
        frac = float((pseudo_prob >= TAU).float().mean())
        pseudo_weight = torch.full_like(pseudo_prob, frac)

    # ClassMix blend (``pfst_v4.py:277-295``; jitter/blur disabled)
    m = masks.unsqueeze(1)
    mixed_img = m * img + (1 - m) * target_strong
    mixed_lbl = (masks * gt.float() +
                 (1 - masks) * pseudo_label.float()).long()
    mixed_weight = masks * 1.0 + (1 - masks) * pseudo_weight

    # mixed pass (``pfst_v4.py:298-301``); log vars carry the raw
    # losses, the total applies trg_loss_weight
    mix_logits, _, mix_aux = student(mixed_img)
    log.update(torch_ce_losses(mix_logits, mixed_lbl, mixed_weight,
                               prefix='mix.decode.'))
    log.update(torch_ce_losses(mix_aux, mixed_lbl, mixed_weight,
                               loss_weight=0.4, prefix='mix.aux.'))

    # PFSTLoss aux (``pfst_v4.py:303-341`` tensors dict; x_ema is the
    # replayed backbone feat level, logits_ema the replayed logits)
    tensors = dict(
        logits_trg=mix_logits.detach(),
        logits_ema=ema_up,
        x_ema=f_lvl,
        mix_masks=masks)
    aux = torch_pfst_v1(tensors, k=3, d=2, top_k=3, sim_type='cosine',
                        sigma=30.0, weights=WEIGHTS)
    log.update({n: float(v) for n, v in aux.items()})

    total = (log['decode.loss_ce'] + log['aux.loss_ce'] +
             TRG_LOSS_WEIGHT * (log['mix.decode.loss_ce'] +
                                log['mix.aux.loss_ce']) +
             log['loss_sim_pos'] + log['loss_sim_neg'])
    log['loss'] = float(total)
    return log


def test_pfstv4_one_iteration_golden_trace():
    torch.manual_seed(0)
    student = TorchModel()
    teacher = TorchModel()  # different init -> nontrivial EMA update
    with torch.no_grad():
        for mdl in (student, teacher):
            for m in mdl.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(0)
    rotate_k = np.asarray([1, 3], np.int32)
    flip_v = np.asarray([1, 0], np.int32)
    flip_h = np.asarray([0, 1], np.int32)
    ori = rs.randn(2, SIZE, SIZE, 3).astype(np.float32)
    # the loader's augmented view = the same geometric ops applied to
    # the image itself; strong_aug differs photometrically
    target = np.stack([_np_replay(ori[i], rotate_k[i], flip_v[i],
                                  flip_h[i]) for i in range(2)])
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': target,
        'target_img_strong_aug': (
            target + 0.1 * rs.randn(*target.shape)).astype(np.float32),
        'target_img_ori': ori,
        'rotate_k': rotate_k,
        'flip_vertical': flip_v,
        'flip_horizontal': flip_h,
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
    # masks for injection into the torch twin, and sanity-check the
    # replay actually fed the pseudo-labels
    updated = algo.ema_update(state, algo.alpha)
    premix = jax.jit(
        lambda e, eb, b, r: algo.teacher_and_mix(
            e, eb, b, r, jnp.asarray(MEAN, jnp.float32),
            jnp.asarray(STD, jnp.float32)))(
                updated.ema_params, updated.ema_batch_stats, batch, rng)
    mix_masks = np.asarray(premix['mix_masks'])
    assert 0.0 < mix_masks.mean() < 1.0  # masks actually mix
    # the returned weight is post-blend (masks*1 + (1-masks)*scalar);
    # in the target region it must be the one scalar 'all' fraction
    w = np.asarray(premix['pseudo_weight'])[mix_masks == 0.0]
    assert w.std() < 1e-6 and 0.0 < w.mean() < 1.0

    theirs = torch_pfstv4_step(student, teacher, batch, mix_masks,
                               START_STEP)

    assert set(theirs) == set(ours), sorted(set(theirs) ^ set(ours))
    for k in sorted(theirs):
        np.testing.assert_allclose(
            ours[k], theirs[k], rtol=2e-3, atol=2e-3,
            err_msg=f'log var {k} diverges')

    # post-step EMA params: a*teacher + (1-a)*student, pre-optimizer
    # (``pfst_v4.py:114-126``)
    pt2, _ = _convert(teacher)  # torch teacher was EMA'd in place
    want = _merge(state.ema_params, pt2)
    want_flat = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(want)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            new_state.ema_params):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want_flat[key]),
            rtol=1e-5, atol=1e-6, err_msg=f'EMA param {key}')
