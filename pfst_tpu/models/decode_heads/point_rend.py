"""PointRend + STDC + DPT + KNet heads (mirrors of
``rsiseg/models/decode_heads/{point_head, stdc_head, dpt_head,
knet_head}.py``).

Architecture-faithful implementations (round-2 upgrades):

* **PointRendHead** — train-time importance point sampling with
  oversample/importance ratios and a dedicated point loss on sampled
  coordinates (``point_head.py:270-323`` ``get_points_train`` +
  ``:174-209`` ``forward_train``); test-time refinement replaces the
  coarse logits at the top-N most-uncertain grid points
  (``get_points_test``) with a static-shape top-k.
* **STDCHead** — laplacian-pyramid boundary-target generation
  (``stdc_head.py:24-90``): 3 laplacian convs at stride 1/2/4,
  nearest-upsample, fixed (0.6, 0.3, 0.1) fusion, binary threshold.
* **IterativeDecodeHead / KernelUpdateHead / KernelUpdator** — the
  K-Net stack (``knet_head.py:16-453``): feature-gated dynamic-kernel
  update (Eq. 4/5), multi-head attention BETWEEN kernels, FFN, mask
  FCs, per-stage losses.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import point_sample, resize
from ..builder import HEADS, build_head
from ..utils.layers import ConvModule
from .base import ClsSeg, transform_inputs
from .fcn_head import FCNHead


def calculate_uncertainty(logits):
    """-(top1 - top2) margin (``point_head.py:24-41``); (B,...,K) ->
    (B,...)."""
    top2 = jax.lax.top_k(logits, 2)[0]
    return -(top2[..., 0] - top2[..., 1])


@HEADS.register_module()
class PointRendHead(nn.Module):
    in_channels: Sequence[int] = (256,)
    channels: int = 256
    num_classes: int = 19
    num_fcs: int = 3
    num_points: int = 2048
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    coarse_pred_each_layer: bool = True
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = (0,)
    input_transform: Optional[str] = 'multiple_select'
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.coarse_conv = ConvModule(self.channels, 3, padding=1,
                                      norm_cfg=self.norm_cfg,
                                      dtype=self.dtype,
                                      name='coarse_conv')
        self.coarse_cls = ClsSeg(self.num_classes, self.dropout_ratio,
                                 dtype=self.dtype, name='coarse_cls')
        self.fcs = [nn.Dense(self.channels, dtype=self.dtype,
                             name=f'fc{i}')
                    for i in range(self.num_fcs)]
        self.point_cls = nn.Dense(self.num_classes, dtype=self.dtype,
                                  name='point_cls')

    def _coarse(self, inputs, train):
        fine = [inputs[i] for i in self.in_index][0]
        feats = self.coarse_conv(fine, train=train)
        logits = self.coarse_cls(feats, train=train)
        return fine, feats, logits

    def _point_mlp(self, fine_pts, coarse_pts):
        """Shared point MLP (``point_head.py:107-122``)."""
        y = jnp.concatenate([fine_pts, coarse_pts], axis=-1)
        for fc in self.fcs:
            y = nn.relu(fc(y))
            if self.coarse_pred_each_layer:
                y = jnp.concatenate([y, coarse_pts], axis=-1)
        return self.point_cls(y)

    def __call__(self, inputs, train: bool = False, prev_logits=None):
        if prev_logits is not None:
            # cascade stage (CascadeEncoderDecoder): the previous
            # stage (e.g. FPNHead) supplies the coarse logits; this
            # head's internal coarse branch stays unused
            fine = [inputs[i] for i in self.in_index][0]
            feats = fine
            coarse_logits = prev_logits
        else:
            fine, feats, coarse_logits = self._coarse(inputs, train)
        if train:
            # training uses the coarse dense loss + the sampled point
            # loss (``point_head.py:174-209``); no dense refinement
            return coarse_logits, feats
        # ---- test-time refinement (``get_points_test``) ------------
        b, h, w, k = coarse_logits.shape
        n_pts = min(self.num_points, h * w)
        unc = calculate_uncertainty(coarse_logits).reshape(b, h * w)
        _, idx = jax.lax.top_k(unc, n_pts)

        def gather_pts(feat):
            return jnp.take_along_axis(
                feat.reshape(b, h * w, feat.shape[-1]),
                idx[..., None], axis=1)

        pt_logits = self._point_mlp(gather_pts(fine),
                                    gather_pts(coarse_logits))
        refined = coarse_logits.reshape(b, h * w, k)
        refined = jax.vmap(
            lambda r, i, p: r.at[i].set(p))(refined, idx, pt_logits)
        return refined.reshape(b, h, w, k), feats

    def point_losses(self, inputs, gt,
                     coarse_logits=None) -> Tuple[jnp.ndarray,
                                                  jnp.ndarray]:
        """Importance-sample train points and return
        (point_logits (B,N,K), point_label (B,N)) for the point loss
        (``get_points_train``, ``point_head.py:270-323``).

        Pass the dense pass's ``seg_logits`` as ``coarse_logits`` so
        the coarse head is not recomputed (the reference computes
        ``prev_output`` once and feeds both losses from it)."""
        fine = [inputs[i] for i in self.in_index][0]
        if coarse_logits is None:
            _, _, coarse_logits = self._coarse(inputs, True)
        b = coarse_logits.shape[0]
        rng = self.make_rng('dropout')
        k1, k2 = jax.random.split(rng)
        num_sampled = int(self.num_points * self.oversample_ratio)
        coords = jax.random.uniform(k1, (b, num_sampled, 2))
        # uncertainty of the SAMPLED logits, not sampled uncertainty
        # (the reference comment explains why; point_head.py:300-309)
        pt_logits = point_sample(coarse_logits, coords,
                                 align_corners=self.align_corners)
        unc = calculate_uncertainty(pt_logits)
        n_unc = int(self.importance_sample_ratio * self.num_points)
        _, idx = jax.lax.top_k(unc, n_unc)
        coords_unc = jnp.take_along_axis(
            coords, idx[..., None], axis=1)
        n_rand = self.num_points - n_unc
        if n_rand > 0:
            rand = jax.random.uniform(k2, (b, n_rand, 2))
            coords = jnp.concatenate([coords_unc, rand], axis=1)
        else:
            coords = coords_unc
        fine_pts = point_sample(fine, coords,
                                align_corners=self.align_corners)
        coarse_pts = point_sample(coarse_logits, coords,
                                  align_corners=self.align_corners)
        point_logits = self._point_mlp(fine_pts, coarse_pts)
        point_label = point_sample(
            gt.astype(jnp.float32)[..., None], coords, mode='nearest',
            align_corners=self.align_corners)[..., 0]
        return point_logits, point_label.astype(jnp.int32)


@HEADS.register_module()
class STDCHead(FCNHead):
    """STDC detail-guidance head (``stdc_head.py:10-90``): an FCN head
    trained against laplacian-pyramid boundary targets derived from the
    gt on device."""

    boundary_threshold: float = 0.1

    def transform_targets(self, seg_label):
        """gt (B,H,W) int -> binary boundary target (B,H,W) int32
        (``stdc_head.py:34-87``)."""
        lap = jnp.asarray([[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]],
                          jnp.float32).reshape(3, 3, 1, 1)
        x = seg_label.astype(jnp.float32)[..., None]

        def conv(inp, stride):
            return jax.lax.conv_general_dilated(
                inp, lap, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        thr = self.boundary_threshold
        t1 = jnp.clip(conv(x, 1), 0, None)
        t1 = (t1 > thr).astype(jnp.float32)
        t2 = jnp.clip(conv(x, 2), 0, None)
        t4 = jnp.clip(conv(x, 4), 0, None)
        t2 = resize(t2, size=t1.shape[1:3], mode='nearest')
        t4 = resize(t4, size=t1.shape[1:3], mode='nearest')
        t2 = (t2 > thr).astype(jnp.float32)
        t4 = (t4 > thr).astype(jnp.float32)
        # fixed fusion weights 6/10, 3/10, 1/10 (``stdc_head.py:30-32``)
        fused = 0.6 * t1 + 0.3 * t2 + 0.1 * t4
        return (fused[..., 0] > thr).astype(jnp.int32)


@HEADS.register_module()
class DPTHead(nn.Module):
    """DPT head (``dpt_head.py``): reassemble ViT tokens into a pyramid
    and fuse residually."""
    in_channels: Sequence[int] = (768,) * 4
    channels: int = 256
    num_classes: int = 19
    embed_dims: int = 768
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    readout_type: str = 'ignore'
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        feats = [inputs[i] for i in self.in_index]
        scales = (4, 2, 1, 0.5)
        pyramid = []
        for i, (f, s) in enumerate(zip(feats, scales)):
            y = ConvModule(self.post_process_channels[i], 1,
                           act_cfg={'type': 'none'}, dtype=self.dtype,
                           name=f'reassemble{i}')(f, train=train)
            if s != 1:
                y = resize(y, scale_factor=s, mode='bilinear',
                           align_corners=self.align_corners)
            y = ConvModule(self.channels, 3, padding=1,
                           act_cfg={'type': 'none'}, dtype=self.dtype,
                           name=f'project{i}')(y, train=train)
            pyramid.append(y)
        out = pyramid[-1]
        for i in range(len(pyramid) - 2, -1, -1):
            out = resize(out, size=pyramid[i].shape[1:3],
                         mode='bilinear',
                         align_corners=self.align_corners)
            res = ConvModule(self.channels, 3, padding=1,
                             norm_cfg=self.norm_cfg, dtype=self.dtype,
                             name=f'fuse{i}')(pyramid[i] + out,
                                              train=train)
            out = res
        feats_out = ConvModule(self.channels, 3, padding=1,
                               norm_cfg=self.norm_cfg,
                               dtype=self.dtype,
                               name='head_conv')(out, train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats_out,
                                                      train=train)
        return logits, feats_out


# ---------------------------------------------------------------------
# K-Net (``knet_head.py``)

class KernelUpdator(nn.Module):
    """Feature-gated dynamic kernel update (``knet_head.py:16-140``,
    Eq. 4/5 of the K-Net paper)."""
    in_channels: int = 256
    feat_channels: int = 64
    out_channels: Optional[int] = None
    gate_sigmoid: bool = True
    gate_norm_act: bool = False
    activate_out: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, update_feature, input_feature):
        """update_feature (B,N,C), input_feature (B,N,KK,C) ->
        (B,N,KK,out)."""
        out_c = self.out_channels or self.in_channels
        fc = self.feat_channels
        params = nn.Dense(fc * 2, dtype=self.dtype,
                          name='dynamic_layer')(update_feature)
        param_in, param_out = params[..., :fc], params[..., fc:]
        input_feats = nn.Dense(fc * 2, dtype=self.dtype,
                               name='input_layer')(input_feature)
        input_in = input_feats[..., :fc]
        input_out = input_feats[..., fc:]

        gate_feats = input_in * param_in[..., None, :]
        if self.gate_norm_act:
            gate_feats = nn.relu(nn.LayerNorm(
                dtype=self.dtype, name='gate_norm')(gate_feats))
        input_gate = nn.LayerNorm(dtype=self.dtype,
                                  name='input_norm_in')(
            nn.Dense(fc, dtype=self.dtype,
                     name='input_gate')(gate_feats))
        update_gate = nn.LayerNorm(dtype=self.dtype, name='norm_in')(
            nn.Dense(fc, dtype=self.dtype,
                     name='update_gate')(gate_feats))
        if self.gate_sigmoid:
            input_gate = nn.sigmoid(input_gate)
            update_gate = nn.sigmoid(update_gate)
        param_out = nn.LayerNorm(dtype=self.dtype,
                                 name='norm_out')(param_out)
        input_out = nn.LayerNorm(dtype=self.dtype,
                                 name='input_norm_out')(input_out)
        if self.activate_out:
            param_out = nn.relu(param_out)
            input_out = nn.relu(input_out)
        # gate mechanism, Eq. (5)
        features = update_gate * param_out[..., None, :] + \
            input_gate * input_out
        features = nn.Dense(out_c, dtype=self.dtype,
                            name='fc_layer')(features)
        features = nn.LayerNorm(dtype=self.dtype,
                                name='fc_norm')(features)
        return nn.relu(features)


class KernelMHA(nn.Module):
    """Multi-head attention BETWEEN kernels with residual (the mmcv
    MultiheadAttention used at ``knet_head.py:228-231``)."""
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype,
                       name='qkv')(x).reshape(
            b, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            jnp.einsum('bhqd,bhkd->bhqk', q, k,
                       preferred_element_type=jnp.float32) * hd**-0.5,
            axis=-1)
        o = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        o = nn.Dense(self.dim, dtype=self.dtype, name='proj')(
            o.astype(self.dtype))
        return x + o    # mmcv MultiheadAttention adds the identity


class KernelUpdateHead(nn.Module):
    """One K-Net refinement stage (``knet_head.py:142-390``).

    ``conv_kernel_size == 1`` (every shipped semantic-seg config) runs
    the dynamic conv as a single einsum on the MXU.  ``k > 1`` follows
    the reference's dynamic-conv form (per-sample K x K kernels,
    ``knet_head.py:349-371``): kernels travel as ``(B, N, K*K, C)``,
    the inter-kernel attention runs over the flattened ``K*K*C`` dim
    (``knet_head.py:226-231``), and the mask is produced by a batched
    ``lax.conv_general_dilated`` with per-image weights instead of the
    reference's python loop over ``F.conv2d``.  A 1x1 seed kernel
    (the generate head's classifier) is zero-embedded at the K x K
    center, which makes stage-0 maths identical to the 1x1 form —
    the reference's own seed path would shape-error for k>1."""
    num_classes: int = 150
    num_ffn_fcs: int = 2
    num_heads: int = 8
    num_mask_fcs: int = 3
    feedforward_channels: int = 2048
    in_channels: int = 256
    out_channels: int = 256
    conv_kernel_size: int = 1
    with_ffn: bool = True
    feat_transform_cfg: Optional[dict] = None
    kernel_updator_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kernels, mask_preds, train: bool = False):
        """x (B,H,W,C), kernels (B,N,C) or (B,N,K*K,C), mask_preds
        (B,H,W,N) -> (new_mask (B,H,W,N), new_kernels — (B,N,C) when
        k==1, else (B,N,K*K,C))."""
        k = self.conv_kernel_size
        assert k % 2 == 1, (
            f'conv_kernel_size must be odd, got {k}: SAME padding '
            'k//2 and the center-seed embedding assume a window '
            'center')
        kk = k * k
        if kernels.ndim == 3:            # (B,N,C) == 1x1 kernels
            kernels = kernels[:, :, None, :]
        if kernels.shape[2] != kk:
            # 1x1 seed into a k x k head: zero-embed at the window
            # center (row-major index), preserving the 1x1 conv maths
            assert kernels.shape[2] == 1, (
                f'kernel grid {kernels.shape[2]} does not match '
                f'conv_kernel_size {k}')
            seed = kernels[:, :, 0, :]
            kernels = jnp.zeros(
                kernels.shape[:2] + (kk, kernels.shape[-1]),
                kernels.dtype).at[:, :, (kk - 1) // 2, :].set(seed)
        if self.feat_transform_cfg is not None:
            x = ConvModule(self.in_channels, 1,
                           norm_cfg=self.feat_transform_cfg.get(
                               'norm_cfg'),
                           act_cfg=self.feat_transform_cfg.get(
                               'act_cfg'),
                           dtype=self.dtype,
                           name='feat_transform')(x, train=train)
        if mask_preds.shape[1:3] != x.shape[1:3]:
            mask_preds = resize(mask_preds, size=x.shape[1:3],
                                mode='bilinear', align_corners=False)
        # group feature assembling, Eq. (3)
        sigmoid_masks = jax.nn.softmax(mask_preds, axis=-1)
        x_feat = jnp.einsum('bhwn,bhwc->bnc',
                            sigmoid_masks.astype(x.dtype), x,
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype)

        upd_cfg = dict(self.kernel_updator_cfg or {})
        upd_cfg.pop('type', None)
        upd_cfg.setdefault('in_channels', self.in_channels)
        obj = KernelUpdator(dtype=self.dtype, name='kernel_update_conv',
                            **upd_cfg)(x_feat, kernels)  # (B,N,KK,C)
        b, n = obj.shape[:2]
        # attention BETWEEN kernels over the flattened K*K*C embedding
        # (``knet_head.py:226-231``: embed_dims = in_channels * k**2)
        obj = obj.reshape(b, n, -1)
        obj = KernelMHA(self.in_channels * kk, self.num_heads,
                        dtype=self.dtype, name='attention')(obj)
        obj = nn.LayerNorm(dtype=self.dtype,
                           name='attention_norm')(obj)
        obj = obj.reshape(b, n, kk, self.in_channels)
        if self.with_ffn:
            y = obj
            for i in range(self.num_ffn_fcs - 1):
                y = nn.relu(nn.Dense(self.feedforward_channels,
                                     dtype=self.dtype,
                                     name=f'ffn_fc{i}')(y))
            y = nn.Dense(self.in_channels, dtype=self.dtype,
                         name=f'ffn_fc{self.num_ffn_fcs - 1}')(y)
            obj = nn.LayerNorm(dtype=self.dtype,
                               name='ffn_norm')(obj + y)
        mask_feat = obj
        for i in range(self.num_mask_fcs):
            mask_feat = nn.Dense(self.in_channels, use_bias=False,
                                 dtype=self.dtype,
                                 name=f'mask_fc{i}')(mask_feat)
            mask_feat = nn.relu(nn.LayerNorm(
                dtype=self.dtype, name=f'mask_norm{i}')(mask_feat))
        mask_feat = nn.Dense(self.out_channels, dtype=self.dtype,
                             name='fc_mask')(mask_feat)  # (B,N,KK,C)
        if k == 1:
            # 1x1 dynamic conv == einsum on the MXU
            new_mask = jnp.einsum(
                'bhwc,bnc->bhwn', x, mask_feat[:, :, 0, :],
                preferred_element_type=jnp.float32).astype(self.dtype)
            return new_mask, obj[:, :, 0, :]
        # k x k dynamic conv: per-image K x K x C x N weights through
        # one batched conv (the reference loops F.conv2d per image,
        # ``knet_head.py:364-371``; correlation, padding k // 2)
        w = mask_feat.reshape(b, n, k, k, self.out_channels)
        w = w.transpose(0, 2, 3, 4, 1)               # (B,K,K,C,N)

        def conv_one(xi, wi):
            return jax.lax.conv_general_dilated(
                xi[None], wi, (1, 1), [(k // 2, k // 2)] * 2,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)[0]

        new_mask = jax.vmap(conv_one)(x, w).astype(self.dtype)
        return new_mask, obj


@HEADS.register_module()
class IterativeDecodeHead(nn.Module):
    """K-Net head (``knet_head.py:394-453``): a kernel-generate head
    produces the stage-0 segmentation and the initial kernels (its
    classifier weights); ``num_stages`` KernelUpdateHeads refine both.
    Training losses apply to EVERY stage (suffix ``.s{i}``)."""
    num_stages: int = 3
    kernel_generate_head: Optional[dict] = None
    kernel_update_head: Optional[Sequence[dict]] = None
    # legacy/common fields accepted for config compat
    in_channels: Any = None
    channels: Any = None
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = 3
    input_transform: Optional[str] = None
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    num_classes: int = 19
    dtype: Any = jnp.float32

    def setup(self):
        gen_cfg = dict(self.kernel_generate_head or dict(
            type='FCNHead', in_channels=self.in_channels or 512,
            channels=self.channels or 256, num_convs=1,
            concat_input=False, num_classes=self.num_classes,
            in_index=self.in_index, norm_cfg=self.norm_cfg,
            dropout_ratio=0.0))
        gen_cfg['dtype'] = self.dtype
        self.kgh = build_head(gen_cfg)
        upd_cfgs = list(self.kernel_update_head or [])
        if not upd_cfgs:
            upd_cfgs = [dict(in_channels=gen_cfg.get('channels', 256),
                             out_channels=gen_cfg.get('channels', 256),
                             num_classes=self.num_classes,
                             feedforward_channels=512)
                        ] * self.num_stages
        heads = []
        for i, c in enumerate(upd_cfgs):
            c = dict(c)
            c.pop('type', None)
            c['dtype'] = self.dtype
            heads.append(KernelUpdateHead(name=f'update_head{i}', **c))
        self.update_heads = heads

    def _find_conv_seg_kernel(self):
        """Stage-0 kernels are the generate head's classifier weights
        (``knet_head.py:431-433``)."""
        p = self.kgh.variables['params']

        def walk(node):
            if isinstance(node, dict):
                if 'conv_seg' in node:
                    return node['conv_seg']['kernel']
                for v in node.values():
                    r = walk(v)
                    if r is not None:
                        return r
            return None

        k = walk(p)
        assert k is not None, 'generate head has no conv_seg classifier'
        return k    # (1, 1, C, num_classes)

    def all_stage_logits(self, inputs, train: bool = False):
        logits0, feats = self.kgh(inputs, train=train)
        kernel = self._find_conv_seg_kernel()[0, 0]     # (C, N)
        b = feats.shape[0]
        kernels = jnp.tile(kernel.T[None], (b, 1, 1))   # (B,N,C)
        stage_segs = [logits0]
        sem_seg = logits0
        for head in self.update_heads:
            sem_seg, kernels = head(feats, kernels, sem_seg,
                                    train=train)
            stage_segs.append(sem_seg)
        return stage_segs, feats

    def __call__(self, inputs, train: bool = False):
        stage_segs, feats = self.all_stage_logits(inputs, train=train)
        return stage_segs[-1], feats


# reference cascade configs name the PointRend stage head 'PointHead'
# (``pointrend_r50.py``); same implementation
HEADS.register_module(name='PointHead', module=PointRendHead)
