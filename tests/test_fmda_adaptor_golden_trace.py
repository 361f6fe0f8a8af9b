"""End-to-end golden trace of ONE FMDAAdaptor iteration vs a torch
twin — completes the DomainAdaptor-family trace set (plain, Adv, V2,
FMDA adaptors all composed-traced).

``FMDAAdaptorV2`` (``rsiseg/models/segmentors/fmda_adaptor_v2.py:
196-228``; the V1/V2 adaptors share the joint-training composition,
V2 skips V1's ``pre_feat_shape`` resize) is joint src+trg supervised
training plus a ``loss_sim_feat`` regularizer over *precomputed*
neighborhood-similarity maps carried in the batch: every
``'sim_feat'``-keyed batch entry is replayed into the augmented frame
per sample via ``transform_by_metas`` (``:207``, rot90 + flips here)
and fed with the raw target logits to ``FeatSimLossV2`` (``:228``),
which nearest-resizes each map to logit resolution itself.  The target
decode/aux ``loss_ce`` keys are scaled by ``weight_trg`` in place
(``:228,250``) before ``_parse_losses`` sums everything — for the
CE-only heads that equals scaling the target total, which is how
pfst_tpu applies it (its log_vars carry the UNSCALED per-key values;
the trace compares those, the total, the post-step parameters and the
BN running stats threaded src-pass -> trg-pass).

The torch side re-derives the reference equations (mmcv is not
installed, so importing ``rsiseg`` is impossible); the FeatSimLossV2
re-derivation is shared with ``tests/test_feat_sim_loss.py``.
Similarity maps are uniform(0,1) draws, so the reference's own
``sim_feat[:,0] > 0`` mask keeps every pixel and nearest
downsampling never ties the k2 (top-k) axis.
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

from test_feat_sim_loss import _torch_featsim_v2  # noqa: E402
from test_uda_golden_trace import (  # noqa: E402
    MEAN, NUM_CLASSES, SIZE, STD, TorchModel, _convert, _merge,
    _model_cfg)

WEIGHT_TRG = 0.5
SIM_WEIGHTS = [(0.3, 0.2), (0.25, 0.15)]
LOGIT_HW = SIZE // 8  # OS8 head resolution of the twin


def _replay_torch(maps, rotate_k, flip_v, flip_h):
    """Reference ``transform_by_metas`` rot90+flip replay
    (``pfst_transforms.py:31-40``), per sample on NCHW data."""
    out = []
    for i in range(maps.shape[0]):
        d = maps[i:i + 1]
        d = torch.rot90(d, int(rotate_k[i]), dims=[2, 3])
        if flip_h[i]:
            d = d.flip(dims=[3])
        if flip_v[i]:
            d = d.flip(dims=[2])
        out.append(d)
    return torch.cat(out, 0)


def test_fmda_adaptor_one_iteration_golden_trace():
    torch.manual_seed(41)
    model = TorchModel()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(43)
    k2 = 9  # kernel_size=3
    batch = {
        'dom1_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'dom1_gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'dom2_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'dom2_gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        # one map at 2x the head resolution (the loss's own nearest
        # resize is exercised) and one at head resolution; two maps to
        # pin the per-map loss suffixes
        'dom2_sim_feat_a': rs.rand(
            2, 2 * LOGIT_HW, 2 * LOGIT_HW, k2).astype(np.float32),
        'dom2_sim_feat_b': rs.rand(
            2, LOGIT_HW, LOGIT_HW, k2).astype(np.float32),
        # recorded geometric augs to replay onto the maps
        'dom2_rotate_k': np.asarray([1, 3], np.int32),
        'dom2_flip_vertical': np.asarray([0, 1], np.int32),
        'dom2_flip_horizontal': np.asarray([1, 0], np.int32),
    }
    batch['dom1_gt_semantic_seg'][0, :8] = 255
    batch['dom2_gt_semantic_seg'][1, -8:] = 255

    mc = _model_cfg()
    from pfst_tpu.models.builder import SEGMENTORS
    adaptor = SEGMENTORS.build(dict(
        type='FMDAAdaptorV2',
        backbone=mc['backbone'], decode_head=mc['decode_head'],
        auxiliary_head=mc['auxiliary_head'], weight_trg=WEIGHT_TRG,
        loss_sim_feat=dict(type='FeatSimLossV2', top_k=2, dilation=1,
                           kernel_size=3, weights=SIM_WEIGHTS),
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    tx = optax.sgd(1e-2)
    state = adaptor.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3),
                               tx)
    ps, bs = _convert(model)
    state = state.replace(params=_merge(state.params, ps),
                          batch_stats=_merge(state.batch_stats, bs))
    step_fn = adaptor.make_train_step(tx, MEAN, STD, donate=False)
    new_state, log_vars, _ = step_fn(
        state, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(3))
    ours = {k: float(v) for k, v in log_vars.items()}

    # ---- torch twin (``fmda_adaptor.py:190-270`` composition) ----
    img_src = torch.from_numpy(batch['dom1_img']).permute(0, 3, 1, 2)
    gt_src = torch.from_numpy(batch['dom1_gt_semantic_seg']).long()
    img_trg = torch.from_numpy(batch['dom2_img']).permute(0, 3, 1, 2)
    gt_trg = torch.from_numpy(batch['dom2_gt_semantic_seg']).long()
    model.train()

    def ce(logits, label, lw=1.0):
        up = F.interpolate(logits, size=label.shape[1:],
                           mode='bilinear', align_corners=False)
        return F.cross_entropy(up, label, ignore_index=255,
                               reduction='none').mean() * lw

    # BN buffers update src pass then trg pass (sequential
    # extract_feat calls, ``fmda_adaptor.py:215-216``)
    feats_src = model.backbone(img_src)
    logits_src, _ = model.decode_head(feats_src)
    aux_src = model.auxiliary_head(feats_src)
    feats_trg = model.backbone(img_trg)
    logits_trg, _ = model.decode_head(feats_trg)
    aux_trg = model.auxiliary_head(feats_trg)

    l_dec_src = ce(logits_src, gt_src)
    l_aux_src = ce(aux_src, gt_src, 0.4)
    l_dec_trg = ce(logits_trg, gt_trg)
    l_aux_trg = ce(aux_trg, gt_trg, 0.4)

    # sim maps: meta replay at native resolution
    # (``fmda_adaptor_v2.py:201-211``; the loss resizes internally);
    # sorted key order = a then b
    aug_maps = []
    for key in ('dom2_sim_feat_a', 'dom2_sim_feat_b'):
        m = torch.from_numpy(batch[key]).permute(0, 3, 1, 2)
        aug_maps.append(_replay_torch(
            m, batch['dom2_rotate_k'], batch['dom2_flip_vertical'],
            batch['dom2_flip_horizontal']))
    sim_losses, _ = _torch_featsim_v2(aug_maps, logits_trg,
                                      SIM_WEIGHTS)

    total = l_dec_src + l_aux_src + \
        WEIGHT_TRG * (l_dec_trg + l_aux_trg) + \
        sum(sim_losses.values())

    opt = torch.optim.SGD(model.parameters(), lr=1e-2)
    opt.zero_grad()
    total.backward()
    opt.step()

    # per-key values (pfst_tpu logs the trg keys unscaled)
    np.testing.assert_allclose(ours['src.dec.decode.loss_ce'],
                               float(l_dec_src), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours['src.dec.aux.loss_ce'],
                               float(l_aux_src), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours['trg.dec.decode.loss_ce'],
                               float(l_dec_trg), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours['trg.dec.aux.loss_ce'],
                               float(l_aux_trg), rtol=2e-3, atol=2e-3)
    for k, v in sim_losses.items():
        np.testing.assert_allclose(ours[k], float(v), rtol=2e-3,
                                   atol=2e-3, err_msg=k)
    np.testing.assert_allclose(ours['loss'], float(total), rtol=2e-3,
                               atol=2e-3)

    # post-step params + BN running stats
    ps2, bs2 = _convert(model)
    for got, want_tree, ref_tree, tol in (
            (new_state.params, ps2, state.params, 1e-3),
            (new_state.batch_stats, bs2, state.batch_stats, 2e-3)):
        want = _merge(ref_tree, want_tree)
        want_flat = {jax.tree_util.keystr(p): v for p, v in
                     jax.tree_util.tree_leaves_with_path(want)}
        for path, leaf in jax.tree_util.tree_leaves_with_path(got):
            key = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(want_flat[key]),
                rtol=tol, atol=3e-5, err_msg=f'post-step {key}')
