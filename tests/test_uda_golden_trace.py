"""End-to-end golden trace of ONE full PFGST UDA iteration vs a torch
twin (VERDICT r2 missing #1).

Composes the entire step the reference executes in
``rsiseg/models/uda/pfgst.py:179-356`` — EMA teacher update -> source
supervised pass (decode + aux CE) -> teacher pseudo-labels on the
target batch -> ``thre_type`` confidence weighting -> ClassMix blend ->
mixed-pass training with pixel weights -> the six PFGST
neighborhood-similarity loss terms -> ``_parse_losses`` total
(``segmentors/base.py:177-222``) — in BOTH frameworks on identical
weights, inputs and injected ClassMix masks, and asserts every log var
and the post-step EMA parameters agree within float tolerance.

The torch side re-derives the reference math independently (mmcv is
not installed here, so importing ``rsiseg`` itself is impossible; the
per-op derivations carry reference ``file:line`` citations and the
PFGST-loss twin is shared with ``tests/test_pfgst_loss.py``).
Randomness that cannot be made bitwise-identical across frameworks is
removed from the trace the way the reference itself can remove it:
``blur=False`` and ``color_jitter_probability=1.0`` (the reference
gate applies jitter when draw > p, ``dacs_transforms.py:59-66``) and
``dropout_ratio=0``; the ClassMix masks are generated once on the JAX
side and injected into the torch twin.

BN subtleties covered: both student passes run train-mode BN with the
running stats threaded source-pass -> mixed-pass (reference updates
in-place sequentially); the teacher runs train-mode BN whose stat
updates are discarded (normalization uses batch stats either way, so
the reference's in-place teacher buffer updates are loss-invisible —
``pfgst.py:247-257``).  Final student running stats are also compared
(torch uses unbiased batch var for the running update; at n = B*H*W
the n/(n-1) gap is < 1e-4 relative).
"""
import os.path as osp
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))

from convert_torch_checkpoint import convert_state_dict  # noqa: E402
from test_pfgst_loss import WEIGHTS, torch_pfgst  # noqa: E402

from pfst_tpu.models import build_train_model  # noqa: E402

NORM = dict(type='BN', requires_grad=True)
MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]
NUM_CLASSES = 5
SIZE = 128
ALPHA = 0.999
TAU = 0.35  # low enough that random-init softmax clears it somewhere,
#             so both thre_type modes produce nontrivial weights
START_STEP = 3


# ------------------------- torch twin model ---------------------------
class ConvBN(nn.Module):
    """mmcv ConvModule twin: keys ``conv.weight`` / ``bn.*``."""

    def __init__(self, cin, cout, k, stride=1, padding=0, dilation=1,
                 groups=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, padding, dilation,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x


class SepConvBN(nn.Module):
    """mmcv DepthwiseSeparableConvModule twin."""

    def __init__(self, cin, cout, k, padding=0, dilation=1):
        super().__init__()
        self.depthwise_conv = ConvBN(cin, cin, k, padding=padding,
                                     dilation=dilation, groups=cin)
        self.pointwise_conv = ConvBN(cin, cout, 1)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class BasicBlock(nn.Module):
    """mmcv ResNet BasicBlock: conv1 carries stride+dilation
    (``resnet.py`` BasicBlock), conv2 is plain 3x3."""

    def __init__(self, cin, planes, stride=1, dilation=1,
                 downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, dilation,
                               dilation, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return F.relu(out + idn)


class TorchBackbone(nn.Module):
    """depth-18 ResNetV1c: deep stem, strides (1,2,1,1), dilations
    (1,1,2,4) with contract_dilation (first block of a dilated stage
    uses dilation//2 — ``models/utils/res_layer.py``)."""

    def __init__(self, bc=8):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, bc // 2, 3, 2, 1, bias=False),
            nn.BatchNorm2d(bc // 2), nn.ReLU(True),
            nn.Conv2d(bc // 2, bc // 2, 3, 1, 1, bias=False),
            nn.BatchNorm2d(bc // 2), nn.ReLU(True),
            nn.Conv2d(bc // 2, bc, 3, 1, 1, bias=False),
            nn.BatchNorm2d(bc), nn.ReLU(True))
        self.layer1 = nn.Sequential(
            BasicBlock(bc, bc), BasicBlock(bc, bc))
        self.layer2 = nn.Sequential(
            BasicBlock(bc, bc * 2, stride=2, downsample=True),
            BasicBlock(bc * 2, bc * 2))
        self.layer3 = nn.Sequential(
            BasicBlock(bc * 2, bc * 4, dilation=1, downsample=True),
            BasicBlock(bc * 4, bc * 4, dilation=2))
        self.layer4 = nn.Sequential(
            BasicBlock(bc * 4, bc * 8, dilation=2, downsample=True),
            BasicBlock(bc * 8, bc * 8, dilation=4))

    def forward(self, x):
        x = self.stem(x)
        x = F.max_pool2d(x, 3, 2, 1)
        c1 = self.layer1(x)
        c2 = self.layer2(c1)
        c3 = self.layer3(c2)
        c4 = self.layer4(c3)
        return c1, c2, c3, c4


class TorchSepASPPHead(nn.Module):
    """DepthwiseSeparableASPPHead twin (``sep_aspp_head.py:30-111``)."""

    def __init__(self, in_ch, ch, c1_in, c1_ch, num_classes,
                 dilations=(1, 12, 24, 36)):
        super().__init__()
        self.image_pool = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                        ConvBN(in_ch, ch, 1))
        mods = []
        for d in dilations:
            if d == 1:
                mods.append(ConvBN(in_ch, ch, 1))
            else:
                mods.append(SepConvBN(in_ch, ch, 3, padding=d,
                                      dilation=d))
        self.aspp_modules = nn.ModuleList(mods)
        self.bottleneck = ConvBN(ch * (len(dilations) + 1), ch, 3,
                                 padding=1)
        self.c1_bottleneck = ConvBN(c1_in, c1_ch, 1)
        self.sep_bottleneck = nn.Sequential(
            SepConvBN(ch + c1_ch, ch, 3, padding=1),
            SepConvBN(ch, ch, 3, padding=1))
        self.conv_seg = nn.Conv2d(ch, num_classes, 1)

    def forward(self, inputs):
        x = inputs[-1]
        pooled = F.interpolate(self.image_pool(x), size=x.shape[2:],
                               mode='bilinear', align_corners=False)
        outs = [pooled] + [m(x) for m in self.aspp_modules]
        output = self.bottleneck(torch.cat(outs, 1))
        features = output  # decoded_features (sep_aspp_head.py:92)
        c1 = self.c1_bottleneck(inputs[0])
        output = F.interpolate(output, size=c1.shape[2:],
                               mode='bilinear', align_corners=False)
        output = self.sep_bottleneck(torch.cat([output, c1], 1))
        return self.conv_seg(output), features


class TorchFCNHead(nn.Module):
    def __init__(self, in_ch, ch, num_classes):
        super().__init__()
        self.convs = nn.ModuleList([ConvBN(in_ch, ch, 3, padding=1)])
        self.conv_seg = nn.Conv2d(ch, num_classes, 1)

    def forward(self, inputs):
        return self.conv_seg(self.convs[0](inputs[2]))


class TorchModel(nn.Module):
    def __init__(self, bc=8, num_classes=NUM_CLASSES):
        super().__init__()
        self.backbone = TorchBackbone(bc)
        self.decode_head = TorchSepASPPHead(bc * 8, 16, bc, 4,
                                            num_classes)
        self.auxiliary_head = TorchFCNHead(bc * 4, 8, num_classes)

    def forward(self, x):
        feats = self.backbone(x)
        logits, decoded = self.decode_head(feats)
        aux = self.auxiliary_head(feats)
        return logits, decoded, aux


# ------------------------- torch twin step ----------------------------
def torch_ce_losses(logits, label, weight=None, loss_weight=1.0,
                    prefix=''):
    """``decode_head.py:249-283``: resize logits to label size, CE with
    legacy all-pixel averaging (avg_non_ignore=False), pixel accuracy."""
    logits = F.interpolate(logits, size=label.shape[1:],
                           mode='bilinear', align_corners=False)
    raw = F.cross_entropy(logits, label, reduction='none',
                          ignore_index=255)
    if weight is not None:
        raw = raw * weight
    loss = raw.mean() * loss_weight
    valid = label != 255
    pred = logits.argmax(1)
    acc = (pred[valid] == label[valid]).float().mean() * 100.0
    return {f'{prefix}loss_ce': float(loss),
            f'{prefix}acc_seg': float(acc)}


def torch_pfgst_step(student, teacher, batch, mix_masks, thre_type,
                     iter_idx):
    """The reference iteration ``pfgst.py:179-356`` on the twins."""
    img = torch.from_numpy(batch['img']).permute(0, 3, 1, 2)
    gt = torch.from_numpy(batch['gt_semantic_seg']).long()
    target_img = torch.from_numpy(batch['target_img']).permute(
        0, 3, 1, 2)
    target_strong = torch.from_numpy(
        batch['target_img_strong_aug']).permute(0, 3, 1, 2)
    masks = torch.from_numpy(mix_masks).float()          # (B,H,W)

    # EMA update (``pfgst.py:116-127``): parameters only
    a = min(1.0 - 1.0 / (iter_idx + 1), ALPHA)
    with torch.no_grad():
        for pt, ps in zip(teacher.parameters(), student.parameters()):
            pt.mul_(a).add_(ps, alpha=1.0 - a)

    log = {}
    student.train()
    teacher.train()

    # source pass (``pfgst.py:225-237``)
    src_logits, src_decoded, src_aux = student(img)
    log.update(torch_ce_losses(src_logits, gt, prefix='decode.'))
    log.update(torch_ce_losses(src_aux, gt, loss_weight=0.4,
                               prefix='aux.'))

    # teacher pseudo-labels (``pfgst.py:247-268``); encode_decode
    # resizes logits to input size before softmax
    with torch.no_grad():
        ema_logits, ema_decoded, _ = teacher(target_img)
        ema_up = F.interpolate(ema_logits, size=img.shape[2:],
                               mode='bilinear', align_corners=False)
        ema_softmax = torch.softmax(ema_up, dim=1)
        pseudo_prob, pseudo_label = torch.max(ema_softmax, dim=1)
        large = (pseudo_prob >= TAU).float()
        if thre_type == 'all':
            pseudo_weight = torch.full_like(pseudo_prob,
                                            float(large.mean()))
        else:
            pseudo_weight = large

    # ClassMix blend (``pfgst.py:280-300``; jitter/blur disabled)
    m = masks.unsqueeze(1)
    mixed_img = m * img + (1 - m) * target_strong
    mixed_lbl = (masks * gt.float() +
                 (1 - masks) * pseudo_label.float()).long()
    mixed_weight = masks * 1.0 + (1 - masks) * pseudo_weight

    # mixed pass (``pfgst.py:303-310``)
    mix_logits, _, mix_aux = student(mixed_img)
    log.update(torch_ce_losses(mix_logits, mixed_lbl, mixed_weight,
                               prefix='mix.decode.'))
    log.update(torch_ce_losses(mix_aux, mixed_lbl, mixed_weight,
                               loss_weight=0.4, prefix='mix.aux.'))

    # PFGST aux losses (``pfgst.py:312-342``; x = decoded feats since
    # use_decoded_feats=True, logits_trg = the mixed-pass logits)
    tensors = dict(
        logits_trg=mix_logits.detach(),
        gt_src=gt,
        x_ema=ema_decoded,
        x_src=src_decoded.detach(),
        mix_masks=masks)
    log.update(torch_pfgst(tensors, k=3, d=2, top_k=3,
                           sim_type='cosine', sigma=None, downscale=0.5,
                           weights=WEIGHTS))

    total = sum(v for n, v in log.items() if 'loss' in n)
    log['loss'] = float(total)
    return log


# ------------------------------ JAX side ------------------------------
def _merge(ref_tree, new_tree, path=''):
    out = {}
    for k, v in ref_tree.items():
        if isinstance(v, dict):
            out[k] = _merge(v, new_tree.get(k, {}), f'{path}/{k}')
        else:
            val = new_tree.get(k)
            if val is None:
                raise AssertionError(f'unconverted leaf {path}/{k}')
            assert np.asarray(val).shape == v.shape, (path, k, v.shape)
            out[k] = jnp.asarray(val)
    return out


def _model_cfg():
    return dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNetV1c', depth=18, num_stages=4,
                      base_channels=8, stem_channels=8,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), norm_cfg=NORM,
                      norm_eval=False, style='pytorch',
                      contract_dilation=True),
        decode_head=dict(
            type='DepthwiseSeparableASPPHead', in_channels=64,
            in_index=3, channels=16, dilations=(1, 12, 24, 36),
            c1_in_channels=8, c1_channels=4, dropout_ratio=0.0,
            num_classes=NUM_CLASSES, norm_cfg=NORM, align_corners=False,
            loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                             loss_weight=1.0)),
        auxiliary_head=dict(
            type='FCNHead', in_channels=32, in_index=2, channels=8,
            num_convs=1, concat_input=False, dropout_ratio=0.0,
            num_classes=NUM_CLASSES, norm_cfg=NORM, align_corners=False,
            loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                             loss_weight=0.4)),
        train_cfg=dict(), test_cfg=dict(mode='whole'))


def _uda_cfg(thre_type):
    return dict(
        type='PFGST', alpha=ALPHA, pseudo_threshold=TAU,
        pseudo_weight_ignore_top=0, pseudo_weight_ignore_bottom=0,
        imnet_feature_dist_lambda=0, mix='class',
        blur=False, color_jitter_strength=0.2,
        color_jitter_probability=1.0,  # ref gate: jitter iff draw > p
        thre_type=thre_type, trg_loss_weight=1.0,
        use_decoded_feats=True,
        aux_losses=[dict(
            type='PFGSTLoss', kernel_size=3, dilation=2, top_k=3,
            weights=WEIGHTS, sim_type='cosine', feat_level=None,
            detach_unfold=True, downscale=0.5)])


def _convert(model):
    params, batch_stats, skipped = convert_state_dict(
        model.state_dict())
    assert not [k for k in skipped if 'num_batches' not in k], skipped
    return params, batch_stats


@pytest.mark.parametrize('thre_type', ['all', 'part'])
def test_pfgst_one_iteration_golden_trace(thre_type):
    torch.manual_seed(0)
    student = TorchModel()
    teacher = TorchModel()  # different init -> nontrivial EMA update
    with torch.no_grad():
        for mdl in (student, teacher):
            for m in mdl.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(0)
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'target_img_strong_aug': rs.randn(2, SIZE, SIZE, 3).astype(
            np.float32),
    }
    batch['gt_semantic_seg'][0, :8] = 255  # exercise the ignore path

    algo = build_train_model(dict(uda=_uda_cfg(thre_type),
                                  model=_model_cfg(),
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

    # re-derive the exact premix the step used (same rng split) to
    # extract the ClassMix masks for injection into the torch twin
    updated = algo.ema_update(state, algo.alpha)
    premix = jax.jit(
        lambda e, eb, b, r: algo.teacher_and_mix(
            e, eb, b, r, jnp.asarray(MEAN, jnp.float32),
            jnp.asarray(STD, jnp.float32)))(
                updated.ema_params, updated.ema_batch_stats, batch, rng)
    mix_masks = np.asarray(premix['mix_masks'])
    assert 0.0 < mix_masks.mean() < 1.0  # masks actually mix

    theirs = torch_pfgst_step(student, teacher, batch, mix_masks,
                              thre_type, START_STEP)

    assert set(theirs) == set(ours), (
        sorted(set(theirs) ^ set(ours)))
    for k in sorted(theirs):
        np.testing.assert_allclose(
            ours[k], theirs[k], rtol=2e-3, atol=2e-3,
            err_msg=f'log var {k} diverges (thre_type={thre_type})')

    # post-step EMA params: a*teacher + (1-a)*student
    # (``pfgst.py:116-127``), computed BEFORE the optimizer update
    pt2, _ = _convert(teacher)  # torch teacher was EMA'd in place
    want = _merge(state.ema_params, pt2)
    got_leaves = jax.tree_util.tree_leaves_with_path(
        new_state.ema_params)
    want_flat = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(want)}
    for path, leaf in got_leaves:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want_flat[key]),
            rtol=1e-5, atol=1e-6, err_msg=f'EMA param {key}')

    # student BN running stats after BOTH passes (source then mixed,
    # momentum-chained in order — ``pfgst.py:225-310`` in-place twin)
    _, bs2 = _convert(student)
    want_bs = _merge(state.batch_stats, bs2)
    want_flat = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(want_bs)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            new_state.batch_stats):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want_flat[key]),
            rtol=2e-3, atol=2e-4, err_msg=f'batch stat {key}')


def test_pfgst_gradient_golden_trace():
    """Gradient-level extension of the PFGST golden trace: the same
    composed iteration with SGD on both sides, comparing the
    POST-STEP STUDENT parameters.  The log-var trace above is
    forward-only and the EMA check is optimizer-independent, so
    neither can see a misplaced detach/stop_gradient anywhere in the
    composition — this can.  Gradient paths exercised exactly as the
    reference wires them (``pfgst.py:312-342`` tensors are NOT
    detached): the four CE terms through both student passes,
    loss_src_* through ``x_src`` (the src-pass decoded features), and
    loss_sim_* through the mixed-pass logits with only the UNFOLDED
    prob map detached (``pfgst_loss.py:147-148``,
    ``detach_unfold=True``); the teacher is gradient-free."""
    torch.manual_seed(0)
    student = TorchModel()
    teacher = TorchModel()
    with torch.no_grad():
        for mdl in (student, teacher):
            for m in mdl.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(0)
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'target_img_strong_aug': rs.randn(2, SIZE, SIZE, 3).astype(
            np.float32),
    }
    batch['gt_semantic_seg'][0, :8] = 255

    algo = build_train_model(dict(uda=_uda_cfg('all'),
                                  model=_model_cfg(),
                                  runner=dict(max_iters=100)))
    tx = optax.sgd(1e-2)
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
    new_state, _, _ = step_fn(state, batch, rng)

    updated = algo.ema_update(state, algo.alpha)
    premix = jax.jit(
        lambda e, eb, b, r: algo.teacher_and_mix(
            e, eb, b, r, jnp.asarray(MEAN, jnp.float32),
            jnp.asarray(STD, jnp.float32)))(
                updated.ema_params, updated.ema_batch_stats, batch, rng)
    mix_masks = np.asarray(premix['mix_masks'])

    # ---- torch twin with backward ----
    img = torch.from_numpy(batch['img']).permute(0, 3, 1, 2)
    gt = torch.from_numpy(batch['gt_semantic_seg']).long()
    target_img = torch.from_numpy(batch['target_img']).permute(
        0, 3, 1, 2)
    target_strong = torch.from_numpy(
        batch['target_img_strong_aug']).permute(0, 3, 1, 2)
    masks = torch.from_numpy(mix_masks).float()

    a = min(1.0 - 1.0 / (START_STEP + 1), ALPHA)
    with torch.no_grad():
        for pt_, ps_ in zip(teacher.parameters(),
                            student.parameters()):
            pt_.mul_(a).add_(ps_, alpha=1.0 - a)

    student.train()
    teacher.train()

    def ce_t(logits, label, weight=None, lw=1.0):
        up = F.interpolate(logits, size=label.shape[1:],
                           mode='bilinear', align_corners=False)
        raw = F.cross_entropy(up, label, reduction='none',
                              ignore_index=255)
        if weight is not None:
            raw = raw * weight
        return raw.mean() * lw

    src_logits, src_decoded, src_aux = student(img)
    total = ce_t(src_logits, gt) + ce_t(src_aux, gt, lw=0.4)

    with torch.no_grad():
        ema_logits, ema_decoded, _ = teacher(target_img)
        ema_up = F.interpolate(ema_logits, size=img.shape[2:],
                               mode='bilinear', align_corners=False)
        ema_softmax = torch.softmax(ema_up, dim=1)
        pseudo_prob, pseudo_label = torch.max(ema_softmax, dim=1)
        large = (pseudo_prob >= TAU).float()
        pseudo_weight = torch.full_like(pseudo_prob,
                                        float(large.mean()))

    m = masks.unsqueeze(1)
    mixed_img = m * img + (1 - m) * target_strong
    mixed_lbl = (masks * gt.float() +
                 (1 - masks) * pseudo_label.float()).long()
    mixed_weight = masks * 1.0 + (1 - masks) * pseudo_weight

    mix_logits, _, mix_aux = student(mixed_img)
    total = total + ce_t(mix_logits, mixed_lbl, mixed_weight) + \
        ce_t(mix_aux, mixed_lbl, mixed_weight, lw=0.4)

    tensors = dict(
        logits_trg=mix_logits,       # NOT detached (pfgst.py:312-327)
        gt_src=gt,
        x_ema=ema_decoded,           # teacher: gradient-free
        x_src=src_decoded,           # NOT detached
        mix_masks=masks)
    terms = torch_pfgst(tensors, k=3, d=2, top_k=3,
                        sim_type='cosine', sigma=None, downscale=0.5,
                        weights=WEIGHTS, detach_unfold=True,
                        as_tensors=True)
    total = total + sum(v for n, v in terms.items() if 'loss' in n)

    opt = torch.optim.SGD(student.parameters(), lr=1e-2)
    opt.zero_grad()
    total.backward()
    opt.step()

    ps2, _ = _convert(student)
    want = _merge(state.params, ps2)
    want_flat = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(want)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            new_state.params):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want_flat[key]),
            rtol=1e-3, atol=3e-5, err_msg=f'post-step student {key}')


# --------------------- DACS golden trace (round 3) ---------------------
def torch_dacs_step(student, teacher, imnet, batch, mix_masks,
                    iter_idx, fd_lambda, fd_classes):
    """The DACS iteration (``rsiseg/models/uda/dacs.py``): PFGST's
    skeleton minus the aux losses, mixing the PLAIN target view
    (``dacs.py:253``), plus the frozen-model feature-distance
    regulariser (``dacs.py:151-161,204-211`` — dead in the reference's
    forward, functional here; the twin mirrors
    ``pfst_tpu/models/uda/pfgst.py:feat_dist_loss``)."""
    img = torch.from_numpy(batch['img']).permute(0, 3, 1, 2)
    gt = torch.from_numpy(batch['gt_semantic_seg']).long()
    target_img = torch.from_numpy(batch['target_img']).permute(
        0, 3, 1, 2)
    masks = torch.from_numpy(mix_masks).float()

    a = min(1.0 - 1.0 / (iter_idx + 1), ALPHA)
    with torch.no_grad():
        for pt_, ps_ in zip(teacher.parameters(),
                            student.parameters()):
            pt_.mul_(a).add_(ps_, alpha=1.0 - a)

    log = {}
    student.train()
    teacher.train()
    imnet.train()

    # source pass, keeping the backbone features for fdist
    feats = student.backbone(img)
    src_logits, _ = student.decode_head(feats)
    src_aux = student.auxiliary_head(feats)
    log.update(torch_ce_losses(src_logits, gt, prefix='decode.'))
    log.update(torch_ce_losses(src_aux, gt, loss_weight=0.4,
                               prefix='aux.'))

    # fdist: L2 over channels between student and frozen stage-4 feats
    with torch.no_grad():
        f_imnet = imnet.backbone(img)[-1]
    f_stu = feats[-1]
    diff = torch.sqrt(((f_stu - f_imnet) ** 2).sum(dim=1) + 1e-12)
    scale = gt.shape[1] // f_stu.shape[2]
    gt_small = gt[:, ::scale, ::scale]
    m = torch.zeros_like(gt_small, dtype=torch.bool)
    for c in fd_classes:
        m = m | (gt_small == c)
    eps = float(np.finfo(np.float32).eps)
    fd = float((diff * m.float()).sum() / (m.float().sum() + eps))
    log['loss_imnet_feat_dist'] = fd_lambda * fd

    # teacher pseudo-labels (thre_type 'all')
    with torch.no_grad():
        ema_logits, _, _ = teacher(target_img)
        ema_up = F.interpolate(ema_logits, size=img.shape[2:],
                               mode='bilinear', align_corners=False)
        ema_softmax = torch.softmax(ema_up, dim=1)
        pseudo_prob, pseudo_label = torch.max(ema_softmax, dim=1)
        large = (pseudo_prob >= TAU).float()
        pseudo_weight = torch.full_like(pseudo_prob,
                                        float(large.mean()))

    # ClassMix blend of the PLAIN target view
    mm = masks.unsqueeze(1)
    mixed_img = mm * img + (1 - mm) * target_img
    mixed_lbl = (masks * gt.float() +
                 (1 - masks) * pseudo_label.float()).long()
    mixed_weight = masks * 1.0 + (1 - masks) * pseudo_weight

    mix_logits, _, mix_aux = student(mixed_img)
    log.update(torch_ce_losses(mix_logits, mixed_lbl, mixed_weight,
                               prefix='mix.decode.'))
    log.update(torch_ce_losses(mix_aux, mixed_lbl, mixed_weight,
                               loss_weight=0.4, prefix='mix.aux.'))

    total = sum(v for n, v in log.items() if 'loss' in n)
    log['loss'] = float(total)
    return log


def test_dacs_one_iteration_golden_trace():
    """DACS (second shipped UDA family): source CE -> fdist -> teacher
    pseudo-labels -> plain-target ClassMix -> mixed CE, all log vars +
    post-step EMA matching the torch twin."""
    torch.manual_seed(3)
    student = TorchModel()
    teacher = TorchModel()
    imnet = TorchModel()
    with torch.no_grad():
        for mdl in (student, teacher):
            for m in mdl.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(5)
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'target_img_strong_aug': rs.randn(2, SIZE, SIZE, 3).astype(
            np.float32),
    }
    fd_classes = [2, 3]
    uda = dict(
        type='DACS', alpha=ALPHA, pseudo_threshold=TAU,
        pseudo_weight_ignore_top=0, pseudo_weight_ignore_bottom=0,
        imnet_feature_dist_lambda=0.01,
        imnet_feature_dist_classes=fd_classes, mix='class',
        blur=False, color_jitter_strength=0.2,
        color_jitter_probability=1.0)
    algo = build_train_model(dict(uda=uda, model=_model_cfg(),
                                  runner=dict(max_iters=100)))
    tx = optax.adamw(6e-5, weight_decay=0.01)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3), tx)

    ps, bs = _convert(student)
    pt, bt = _convert(teacher)
    pi, _ = _convert(imnet)
    state = state.replace(
        params=_merge(state.params, ps),
        batch_stats=_merge(state.batch_stats, bs),
        ema_params=_merge(state.ema_params, pt),
        ema_batch_stats=_merge(state.ema_batch_stats, bt),
        imnet_params=_merge(state.imnet_params, pi),
        step=jnp.asarray(START_STEP, jnp.int32))

    rng = jax.random.PRNGKey(11)
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
                updated.ema_params, updated.ema_batch_stats, batch,
                rng)
    mix_masks = np.asarray(premix['mix_masks'])
    assert 0.0 < mix_masks.mean() < 1.0

    theirs = torch_dacs_step(student, teacher, imnet, batch, mix_masks,
                             START_STEP, 0.01, fd_classes)
    assert set(theirs) == set(ours), sorted(set(theirs) ^ set(ours))
    for k in sorted(theirs):
        np.testing.assert_allclose(
            ours[k], theirs[k], rtol=2e-3, atol=2e-3,
            err_msg=f'log var {k} diverges (DACS)')

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


# ------------- DomainAdaptorAdv golden trace (round 3) ----------------
class TorchFCDiscriminator(nn.Module):
    """Twin of ``pfst_tpu/models/discriminators/fc_discriminator.py``
    (itself mirroring ``rsiseg/.../fc_discriminator.py``: five k4
    LeakyReLU(0.2) convs then global average).  The pfst_tpu module
    adds a small-map guard — stride 1 + flax-'SAME' padding once
    min(H, W) < 4 — so tiny test logits don't collapse to empty
    tensors; at the reference's production logit sizes every conv runs
    the reference's stride-2/pad-1 form.  The twin reproduces the
    guard (flax 'SAME' for k=4, s=1 pads (1, 2) per dim)."""

    def __init__(self, cin, ndf=8):
        super().__init__()
        widths = [ndf, ndf * 2, ndf * 4, ndf * 8, 1]
        for i, w in enumerate(widths):
            setattr(self, f'conv{i}', nn.Conv2d(cin, w, 4))
            cin = w

    def forward(self, x):
        for i in range(5):
            conv = getattr(self, f'conv{i}')
            if min(x.shape[2], x.shape[3]) < 4:
                x = F.conv2d(F.pad(x, (1, 2, 1, 2)), conv.weight,
                             conv.bias, stride=1)
            else:
                x = F.conv2d(x, conv.weight, conv.bias, stride=2,
                             padding=1)
            if i < 4:
                x = F.leaky_relu(x, 0.2)
        return x.mean(dim=(2, 3), keepdim=True)


def _prob2ent_torch(prob):
    """``adv_loss.py:47-50``."""
    c = prob.shape[1]
    return -prob * torch.log2(prob + 1e-30) / np.log2(c)


def torch_adv_step(model, disc, batch, opt_gen, opt_disc, w_gen,
                   w_disc_src, w_disc_trg):
    """The reference adversarial iteration
    (``domain_adaptor_adv.py:260-318``): one generator forward ->
    discriminator updates FIRST on detached entropy maps (:296-305) ->
    generator's adversarial loss against the UPDATED frozen
    discriminator (:308-318)."""
    img = torch.from_numpy(batch['img']).permute(0, 3, 1, 2)
    gt = torch.from_numpy(batch['gt_semantic_seg']).long()
    trg = torch.from_numpy(batch['target_img']).permute(0, 3, 1, 2)

    model.train()
    log = {}

    def ce(logits, label, loss_weight=1.0):
        up = F.interpolate(logits, size=label.shape[1:],
                           mode='bilinear', align_corners=False)
        loss = F.cross_entropy(up, label, ignore_index=255,
                               reduction='none').mean() * loss_weight
        valid = label != 255
        acc = (up.argmax(1)[valid] == label[valid]).float().mean() * 100
        return loss, float(acc)

    # one generator forward (:263-294); BN buffers update src -> trg
    feats_src = model.backbone(img)
    feats_trg = model.backbone(trg)
    logits_src, _ = model.decode_head(feats_src)
    aux_src = model.auxiliary_head(feats_src)
    logits_trg, _ = model.decode_head(feats_trg)
    model.auxiliary_head(feats_trg)  # ref :284 (output unused by loss)

    loss_dec, acc_dec = ce(logits_src, gt)
    loss_aux, acc_aux = ce(aux_src, gt, loss_weight=0.4)
    log['decode.loss_ce'] = float(loss_dec)
    log['decode.acc_seg'] = acc_dec
    log['aux.loss_ce'] = float(loss_aux)
    log['aux.acc_seg'] = acc_aux

    # discriminator phase (:296-305) on detached tensors
    ent_src = _prob2ent_torch(torch.softmax(logits_src.detach(), 1))
    ent_trg = _prob2ent_torch(torch.softmax(logits_trg.detach(), 1))
    d_src, d_trg = disc(ent_src), disc(ent_trg)
    l_d_src = F.l1_loss(d_src, torch.zeros_like(d_src)) * w_disc_src
    l_d_trg = F.l1_loss(d_trg, torch.ones_like(d_trg)) * w_disc_trg
    loss_disc = l_d_src + l_d_trg
    opt_disc.zero_grad()
    loss_disc.backward()
    opt_disc.step()
    log['loss_disc_src'] = float(l_d_src)
    log['loss_disc_trg'] = float(l_d_trg)

    # generator adversarial loss vs the UPDATED, frozen disc (:308-318)
    for p in disc.parameters():
        p.requires_grad_(False)
    ent_g = _prob2ent_torch(torch.softmax(logits_trg, 1))
    d_out = disc(ent_g)
    l_gen_adv = F.l1_loss(d_out, torch.zeros_like(d_out)) * w_gen
    log['loss_gen'] = float(l_gen_adv)
    loss_gen = loss_dec + loss_aux + l_gen_adv
    opt_gen.zero_grad()
    loss_gen.backward()
    opt_gen.step()
    for p in disc.parameters():
        p.requires_grad_(True)

    log['loss'] = float(loss_gen) + float(loss_disc)
    return log


def test_v2_one_iteration_golden_trace():
    """DomainAdaptorV2 (``domain_adaptorv2.py:245-291``): source CE +
    tensors-dict aux loss (EntropyLoss over the target logits) and NO
    supervised target loss; post-step params + BN stats match a torch
    twin of the same composition."""
    torch.manual_seed(17)
    model = TorchModel()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(23)
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
    }

    mc = _model_cfg()
    from pfst_tpu.models.builder import SEGMENTORS
    adaptor = SEGMENTORS.build(dict(
        type='DomainAdaptorV2',
        backbone=mc['backbone'], decode_head=mc['decode_head'],
        auxiliary_head=mc['auxiliary_head'],
        aux_losses=[dict(type='EntropyLoss', loss_type='entropy',
                         weights={'loss_ent': 0.05})],
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    tx = optax.sgd(1e-2)
    state = adaptor.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3),
                               tx)
    ps, bs = _convert(model)
    state = state.replace(params=_merge(state.params, ps),
                          batch_stats=_merge(state.batch_stats, bs))
    step_fn = adaptor.make_train_step(tx, MEAN, STD, donate=False)
    new_state, log_vars, _ = step_fn(state, batch,
                                     jax.random.PRNGKey(5))
    ours = {k: float(v) for k, v in log_vars.items()}

    # ---- torch twin ----
    img = torch.from_numpy(batch['img']).permute(0, 3, 1, 2)
    gt = torch.from_numpy(batch['gt_semantic_seg']).long()
    trg = torch.from_numpy(batch['target_img']).permute(0, 3, 1, 2)
    model.train()
    feats_src = model.backbone(img)
    feats_trg = model.backbone(trg)
    logits_src, _ = model.decode_head(feats_src)
    aux_src = model.auxiliary_head(feats_src)
    logits_trg, _ = model.decode_head(feats_trg)
    model.auxiliary_head(feats_trg)  # BN-stat parity with __call__

    def ce(logits, label, lw=1.0):
        up = F.interpolate(logits, size=label.shape[1:],
                           mode='bilinear', align_corners=False)
        return F.cross_entropy(up, label, ignore_index=255,
                               reduction='none').mean() * lw

    loss_dec = ce(logits_src, gt)
    loss_aux = ce(aux_src, gt, 0.4)
    # EntropyLoss twin (``entropy_loss.py``: normalised per-class
    # entropy summed over classes, meaned)
    prob = torch.softmax(logits_trg, 1)
    ent = (-prob * torch.log2(prob + 1e-30) / np.log2(NUM_CLASSES))
    loss_ent = ent.sum(1).mean() * 0.05
    total = loss_dec + loss_aux + loss_ent
    opt = torch.optim.SGD(model.parameters(), lr=1e-2)
    opt.zero_grad()
    total.backward()
    opt.step()

    np.testing.assert_allclose(ours['decode.loss_ce'],
                               float(loss_dec), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours['aux.loss_ce'], float(loss_aux),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours['loss_ent'], float(loss_ent),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ours['loss'], float(total), rtol=2e-3,
                               atol=2e-3)
    assert not any(k.startswith('trg') for k in ours)

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


def test_adv_one_iteration_golden_trace():
    """DomainAdaptorAdv (adversarial family): the fused two-optimizer
    step matches the torch twin on every log var AND the post-step
    generator params, discriminator params and BN running stats.
    Uses SGD on both optimizers (post-step param comparison;
    adaptive optimizers amplify cross-framework reduction noise)."""
    torch.manual_seed(9)
    model = TorchModel()
    disc = TorchFCDiscriminator(NUM_CLASSES, ndf=8)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    rs = np.random.RandomState(13)
    batch = {
        'img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(
            0, NUM_CLASSES, (2, SIZE, SIZE)).astype(np.int32),
        'target_img': rs.randn(2, SIZE, SIZE, 3).astype(np.float32),
    }
    batch['gt_semantic_seg'][1, -16:] = 255

    mc = _model_cfg()
    from pfst_tpu.models.builder import SEGMENTORS
    adaptor = SEGMENTORS.build(dict(
        type='DomainAdaptorAdv',
        backbone=mc['backbone'], decode_head=mc['decode_head'],
        auxiliary_head=mc['auxiliary_head'],
        discriminator=dict(type='FCDiscriminator',
                           num_in_channels=NUM_CLASSES, ndf=8),
        gen_losses=[dict(type='AdvLoss', loss_type='advent',
                         net_type='gen',
                         weights={'loss_gen': 0.02})],
        disc_losses=[dict(type='AdvLoss', loss_type='advent',
                          net_type='disc',
                          weights={'loss_disc_src': 0.5,
                                   'loss_disc_trg': 0.5})],
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    # reference optimizer-dict keys (domain_adaptor_adv.py:303,316)
    tx = {'generator': optax.sgd(1e-2), 'discriminator': optax.sgd(5e-2)}
    state = adaptor.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3),
                               tx)

    def convert_disc(d):
        return {f'conv{i}': {
            'kernel': getattr(d, f'conv{i}').weight.detach().numpy()
            .transpose(2, 3, 1, 0),
            'bias': getattr(d, f'conv{i}').bias.detach().numpy()}
            for i in range(5)}

    ps, bs = _convert(model)
    state = state.replace(
        params=_merge(state.params, ps),
        batch_stats=_merge(state.batch_stats, bs),
        disc_params=_merge(state.disc_params, convert_disc(disc)))

    step_fn = adaptor.make_train_step(tx, MEAN, STD, donate=False)
    new_state, log_vars, _ = step_fn(state, batch,
                                     jax.random.PRNGKey(21))
    ours = {k: float(v) for k, v in log_vars.items()}

    opt_gen = torch.optim.SGD(model.parameters(), lr=1e-2)
    opt_disc = torch.optim.SGD(disc.parameters(), lr=5e-2)
    theirs = torch_adv_step(model, disc, batch, opt_gen, opt_disc,
                            w_gen=0.02, w_disc_src=0.5, w_disc_trg=0.5)

    assert set(theirs) == set(ours), sorted(set(theirs) ^ set(ours))
    for k in sorted(theirs):
        np.testing.assert_allclose(
            ours[k], theirs[k], rtol=2e-3, atol=2e-3,
            err_msg=f'log var {k} diverges (Adv)')

    # post-step generator params, disc params, BN running stats
    ps2, bs2 = _convert(model)
    pd2 = convert_disc(disc)
    for got, want_tree, ref_tree, tol in (
            (new_state.params, ps2, state.params, 1e-3),
            (new_state.disc_params, pd2, state.disc_params, 1e-3),
            (new_state.batch_stats, bs2, state.batch_stats, 2e-3)):
        want = _merge(ref_tree, want_tree)
        want_flat = {jax.tree_util.keystr(p): v for p, v in
                     jax.tree_util.tree_leaves_with_path(want)}
        for path, leaf in jax.tree_util.tree_leaves_with_path(got):
            key = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(want_flat[key]),
                rtol=tol, atol=3e-5, err_msg=f'post-step {key}')
