"""End-to-end golden trace of ONE plain-DomainAdaptor iteration vs a
torch twin (round-3 extension; completes the segmentor-family trace
set next to the Adv and V2 traces in ``tests/test_uda_golden_trace.py``).

The plain ``DomainAdaptor`` (``rsiseg/models/segmentors/
domain_adaptor.py:17``) is joint supervised training on paired
source+target batches: decode+aux CE on both domains, with the
target-domain ``loss_ce`` keys scaled by ``weight_trg`` in place
(``domain_adaptor.py:197,211``) before ``_parse_losses`` sums
everything.  For the CE-only heads every shipped config uses, scaling
the literal keys equals scaling the target total — which is how
pfst_tpu applies it (documented in the class docstring; log_vars carry
the UNSCALED per-loss values here, so the trace compares the total,
the post-step parameters and the BN running stats, plus the unscaled
per-key values).

What the composed trace pins down: BN running stats threaded
source-pass -> target-pass, ``weight_trg`` applied to the target total
exactly once, and the two-domain gradient flow through one shared
model.
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

from test_uda_golden_trace import (  # noqa: E402
    MEAN, NUM_CLASSES, SIZE, STD, TorchModel, _convert, _merge,
    _model_cfg)

WEIGHT_TRG = 0.5


def test_domain_adaptor_one_iteration_golden_trace():
    torch.manual_seed(31)
    model = TorchModel()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(37)
    batch = {
        'dom1_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'dom1_gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'dom2_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'dom2_gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
    }
    batch['dom1_gt_semantic_seg'][0, :8] = 255
    batch['dom2_gt_semantic_seg'][1, -8:] = 255

    mc = _model_cfg()
    from pfst_tpu.models.builder import SEGMENTORS
    adaptor = SEGMENTORS.build(dict(
        type='DomainAdaptor',
        backbone=mc['backbone'], decode_head=mc['decode_head'],
        auxiliary_head=mc['auxiliary_head'], weight_trg=WEIGHT_TRG,
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    tx = optax.sgd(1e-2)
    state = adaptor.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3),
                               tx)
    ps, bs = _convert(model)
    state = state.replace(params=_merge(state.params, ps),
                          batch_stats=_merge(state.batch_stats, bs))
    step_fn = adaptor.make_train_step(tx, MEAN, STD, donate=False)
    new_state, log_vars, _ = step_fn(state, batch,
                                     jax.random.PRNGKey(3))
    ours = {k: float(v) for k, v in log_vars.items()}

    # ---- torch twin (``domain_adaptor.py`` train_step) ----
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

    # BN buffers update src pass then trg pass, like the reference's
    # sequential extract_feat calls
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
    # reference scales the trg loss_ce keys in place
    # (``domain_adaptor.py:197,211``) == scaling the trg total for
    # CE-only heads
    total = l_dec_src + l_aux_src + WEIGHT_TRG * (l_dec_trg + l_aux_trg)

    opt = torch.optim.SGD(model.parameters(), lr=1e-2)
    opt.zero_grad()
    total.backward()
    opt.step()

    # unscaled per-key values (pfst_tpu logs them unscaled)
    np.testing.assert_allclose(ours['src.decode.loss_ce'],
                               float(l_dec_src), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours['src.aux.loss_ce'],
                               float(l_aux_src), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours['trg.decode.loss_ce'],
                               float(l_dec_trg), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours['trg.aux.loss_ce'],
                               float(l_aux_trg), rtol=2e-3, atol=2e-3)
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
