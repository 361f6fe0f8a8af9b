"""Real-time CNN backbones: FastSCNN, CGNet, ERFNet, BiSeNetV1/V2,
STDC, ICNet.

Capability mirrors of the corresponding
``rsiseg/models/backbones/*.py`` families — faithful stage/branch
structure at the architecture level (stems, branch fusion, detail +
semantic paths), idiomatic NHWC conv blocks.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import BACKBONES
from ..utils.layers import ConvModule, DepthwiseSeparableConvModule


@BACKBONES.register_module()
class FastSCNN(nn.Module):
    """Fast-SCNN: learning-to-downsample + global feature extractor +
    feature fusion (``fast_scnn.py``)."""
    in_channels: int = 3
    downsample_dw_channels: Sequence[int] = (32, 48)
    global_in_channels: int = 64
    global_block_channels: Sequence[int] = (64, 96, 128)
    global_block_strides: Sequence[int] = (2, 2, 1)
    global_out_channels: int = 128
    fusion_out_channels: int = 128
    out_indices: Sequence[int] = (0, 1, 2)
    norm_cfg: Optional[dict] = None
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c2 = self.downsample_dw_channels
        x = ConvModule(c1, 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='ds_conv')(x, train=train)
        x = DepthwiseSeparableConvModule(
            c2, 3, stride=2, padding=1, norm_cfg=self.norm_cfg,
            dtype=self.dtype, name='ds_dw1')(x, train=train)
        higher = DepthwiseSeparableConvModule(
            self.global_in_channels, 3, stride=2, padding=1,
            norm_cfg=self.norm_cfg, dtype=self.dtype,
            name='ds_dw2')(x, train=train)
        y = higher
        from .mobilenet import InvertedResidual
        for i, (ch, st) in enumerate(zip(self.global_block_channels,
                                         self.global_block_strides)):
            for b in range(3):
                y = InvertedResidual(
                    ch, stride=st if b == 0 else 1, expand_ratio=6,
                    norm_cfg=self.norm_cfg, dtype=self.dtype,
                    name=f'gfe{i}_{b}')(y, train=train)
        y = ConvModule(self.global_out_channels, 1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='gfe_out')(y, train=train)
        lower = resize(y, size=higher.shape[1:3], mode='bilinear',
                       align_corners=self.align_corners)
        lower = DepthwiseSeparableConvModule(
            self.fusion_out_channels, 3, padding=1,
            norm_cfg=self.norm_cfg, dtype=self.dtype,
            name='ffm_low')(lower, train=train)
        high = ConvModule(self.fusion_out_channels, 1,
                          norm_cfg=self.norm_cfg,
                          act_cfg={'type': 'none'}, dtype=self.dtype,
                          name='ffm_high')(higher, train=train)
        fused = nn.relu(lower + high)
        return (higher, y, fused)[:max(self.out_indices) + 1] \
            if False else tuple([higher, y, fused][i]
                                for i in self.out_indices)


class _CGBlock(nn.Module):
    out_channels: int
    dilation: int = 2
    stride: int = 1
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.out_channels // 2
        identity = x
        y = ConvModule(n, 3 if self.stride == 2 else 1,
                       stride=self.stride,
                       padding=1 if self.stride == 2 else 0,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='reduce')(x, train=train)
        loc = ConvModule(n, 3, padding=1, groups=n,
                         act_cfg={'type': 'none'}, dtype=self.dtype,
                         name='f_loc')(y, train=train)
        sur = ConvModule(n, 3, padding=self.dilation,
                         dilation=self.dilation, groups=n,
                         act_cfg={'type': 'none'}, dtype=self.dtype,
                         name='f_sur')(y, train=train)
        joi = jnp.concatenate([loc, sur], axis=-1)
        from ..utils.layers import Norm
        joi = nn.leaky_relu(
            Norm(self.out_channels, self.norm_cfg, dtype=self.dtype,
                 name='bn')(joi, train=train), negative_slope=0.01)
        # global context gate
        g = jnp.mean(joi, axis=(1, 2), keepdims=True)
        g = nn.Dense(self.out_channels // 4, dtype=self.dtype,
                     name='fc1')(g)
        g = nn.relu(g)
        g = nn.Dense(self.out_channels, dtype=self.dtype,
                     name='fc2')(g)
        out = joi * nn.sigmoid(g)
        if self.stride == 1 and identity.shape[-1] == \
                self.out_channels:
            out = out + identity
        return out


@BACKBONES.register_module()
class CGNet(nn.Module):
    """Context-guided net (``cgnet.py``)."""
    in_channels: int = 3
    num_channels: Sequence[int] = (32, 64, 128)
    num_blocks: Sequence[int] = (3, 21)
    dilations: Sequence[int] = (2, 4)
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        y = x
        for i in range(3):
            y = ConvModule(self.num_channels[0], 3,
                           stride=2 if i == 0 else 1, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name=f'stem{i}')(y, train=train)
        down1 = resize(inp, size=y.shape[1:3], mode='bilinear',
                       align_corners=False)
        y = jnp.concatenate([y, down1], axis=-1)
        outs = [y]
        for si in range(2):
            blocks = self.num_blocks[si]
            ch = self.num_channels[si + 1]
            for b in range(blocks):
                y = _CGBlock(ch, dilation=self.dilations[si],
                             stride=2 if b == 0 else 1,
                             norm_cfg=self.norm_cfg, dtype=self.dtype,
                             name=f'stage{si}_block{b}')(y, train=train)
            outs.append(y)
        return tuple(outs)


@BACKBONES.register_module()
class ERFNet(nn.Module):
    """ERFNet encoder (``erfnet.py``): downsampler + non-bottleneck-1d."""
    in_channels: int = 3
    enc_downsample_channels: Sequence[int] = (16, 64, 128)
    enc_stage_non_bottlenecks: Sequence[int] = (5, 8)
    dilations_per_stage: Sequence[Sequence[int]] = ((1,), (2, 4, 8, 16))
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        ch_prev = self.in_channels
        for si, ch in enumerate(self.enc_downsample_channels):
            conv = ConvModule(max(ch - ch_prev, 1), 3, stride=2,
                              padding=1, norm_cfg=self.norm_cfg,
                              dtype=self.dtype,
                              name=f'down{si}')(x, train=train)
            pool = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = jnp.concatenate([conv, pool], axis=-1)
            ch_prev = x.shape[-1]
            if si > 0:
                n_blocks = self.enc_stage_non_bottlenecks[si - 1]
                dils = self.dilations_per_stage[si - 1]
                for b in range(n_blocks):
                    d = dils[b % len(dils)]
                    idn = x
                    y = ConvModule(ch_prev, (3, 1), padding=(1, 0),
                                   norm_cfg=None, dtype=self.dtype,
                                   name=f's{si}b{b}_c1')(x, train=train)
                    y = ConvModule(ch_prev, (1, 3), padding=(0, 1),
                                   norm_cfg=self.norm_cfg,
                                   dtype=self.dtype,
                                   name=f's{si}b{b}_c2')(y, train=train)
                    y = ConvModule(ch_prev, (3, 1),
                                   padding=(d, 0), dilation=(d, 1),
                                   norm_cfg=None, dtype=self.dtype,
                                   name=f's{si}b{b}_c3')(y, train=train)
                    y = ConvModule(ch_prev, (1, 3),
                                   padding=(0, d), dilation=(1, d),
                                   norm_cfg=self.norm_cfg,
                                   act_cfg={'type': 'none'},
                                   dtype=self.dtype,
                                   name=f's{si}b{b}_c4')(y, train=train)
                    x = nn.relu(y + idn)
            outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class STDCNet(nn.Module):
    """STDC backbone (``stdc.py``): short-term dense concat modules."""
    stdc_type: str = 'STDCNet1'
    in_channels: int = 3
    channels: Sequence[int] = (32, 64, 256, 512, 1024)
    bottleneck_type: str = 'cat'
    num_convs: int = 4
    out_indices: Sequence[int] = (2, 3, 4)
    with_final_conv: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blocks = {'STDCNet1': (1, 1, 1), 'STDCNet2': (3, 4, 2)}[
            self.stdc_type]
        x = ConvModule(self.channels[0], 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='stem0')(x, train=train)
        x = ConvModule(self.channels[1], 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='stem1')(x, train=train)
        outs = []
        for si, nb in enumerate(blocks):
            ch = self.channels[si + 2]
            for b in range(nb):
                stride = 2 if b == 0 else 1
                parts = []
                y = x
                for ci in range(self.num_convs):
                    part_ch = ch // (2**min(ci + 1,
                                            self.num_convs - 1))
                    y = ConvModule(part_ch, 1 if ci == 0 else 3,
                                   stride=stride if ci == 1 else 1,
                                   padding=0 if ci == 0 else 1,
                                   norm_cfg=self.norm_cfg,
                                   dtype=self.dtype,
                                   name=f's{si}b{b}c{ci}')(y,
                                                           train=train)
                    parts.append(y)
                if stride == 2:
                    parts[0] = nn.avg_pool(parts[0], (3, 3),
                                           strides=(2, 2),
                                           padding=((1, 1), (1, 1)))
                x = jnp.concatenate(parts, axis=-1)
            outs.append(x)
        if self.with_final_conv:
            outs[-1] = ConvModule(self.channels[-1], 1,
                                  norm_cfg=self.norm_cfg,
                                  dtype=self.dtype,
                                  name='final_conv')(outs[-1],
                                                     train=train)
        return tuple(outs[i - 2] for i in self.out_indices)


@BACKBONES.register_module()
class STDCContextPathNet(nn.Module):
    """STDCNet + context path (reference ``stdc.py:329-422``): ARMs on
    the two deepest stages, a global-context branch, and an FFM fusing
    the stride-8 feature with the refined context. Outputs
    ``(stage8, arm32_up, arm16_up, feat_fuse)`` — the first for the
    STDCHead detail loss, the middle two for FCN aux heads, the last
    for the decode head.
    """
    backbone_cfg: Optional[dict] = None
    last_in_channels: Sequence[int] = (1024, 512)
    out_channels: int = 128
    ffm_cfg: Optional[dict] = None
    upsample_mode: str = 'nearest'
    align_corners: Optional[bool] = None
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # the reference CLASS defaults its context-path convs to BN
        # (``stdc.py:371``); configs rely on that default, so a None
        # field here must not mean "no norm"
        norm_cfg = self.norm_cfg if self.norm_cfg is not None \
            else {'type': 'BN'}
        bb_cfg = dict(self.backbone_cfg or
                      dict(type='STDCNet', norm_cfg=norm_cfg))
        outs = list(_SubBackbone(bb_cfg, dtype=self.dtype,
                                 name='backbone')(x, train=train))
        ac = bool(self.align_corners)

        def arm(f, name):
            y = ConvModule(self.out_channels, 3, padding=1,
                           norm_cfg=norm_cfg, dtype=self.dtype,
                           name=f'{name}_conv')(f, train=train)
            g = jnp.mean(y, axis=(1, 2), keepdims=True)
            g = ConvModule(self.out_channels, 1, bias=False,
                           norm_cfg=norm_cfg,
                           act_cfg={'type': 'none'}, dtype=self.dtype,
                           name=f'{name}_atten')(g, train=train)
            return y * nn.sigmoid(g)

        avg = jnp.mean(outs[-1], axis=(1, 2), keepdims=True)
        feature_up = ConvModule(self.out_channels, 1,
                                norm_cfg=norm_cfg,
                                dtype=self.dtype,
                                name='conv_avg')(avg, train=train)
        feature_up = resize(feature_up, size=outs[-1].shape[1:3],
                            mode=self.upsample_mode,
                            align_corners=ac)
        arms_out = []
        for i in range(len(self.last_in_channels)):
            x_arm = arm(outs[len(outs) - 1 - i], f'arm{i}') + feature_up
            feature_up = resize(
                x_arm, size=outs[len(outs) - 2 - i].shape[1:3],
                mode=self.upsample_mode, align_corners=ac)
            feature_up = ConvModule(
                self.out_channels, 3, padding=1,
                norm_cfg=norm_cfg, dtype=self.dtype,
                name=f'arm_out_conv{i}')(feature_up, train=train)
            arms_out.append(feature_up)

        # FFM (``stdc.py:131-204``): 1x1 fuse + squeeze-excite gate
        ffm = dict(self.ffm_cfg or dict(in_channels=384,
                                        out_channels=256,
                                        scale_factor=4))
        cat = jnp.concatenate([outs[0], arms_out[1]], axis=-1)
        fused = ConvModule(ffm['out_channels'], 1,
                           norm_cfg=norm_cfg, dtype=self.dtype,
                           name='ffm_conv0')(cat, train=train)
        att = jnp.mean(fused, axis=(1, 2), keepdims=True)
        att = ConvModule(ffm['out_channels'] // ffm.get(
            'scale_factor', 4), 1, bias=False, dtype=self.dtype,
            name='ffm_att1')(att, train=train)
        att = ConvModule(ffm['out_channels'], 1, bias=False,
                         act_cfg={'type': 'none'}, dtype=self.dtype,
                         name='ffm_att2')(att, train=train)
        feat_fuse = fused * nn.sigmoid(att) + fused
        return (outs[0], arms_out[0], arms_out[1], feat_fuse)


@BACKBONES.register_module()
class BiSeNetV1(nn.Module):
    """BiSeNetV1 (``bisenetv1.py``): spatial path + context path."""
    in_channels: int = 3
    context_channels: Sequence[int] = (128, 256, 512)
    spatial_channels: Sequence[int] = (64, 64, 64, 128)
    out_channels: int = 256
    backbone_cfg: Optional[dict] = None
    out_indices: Sequence[int] = (0, 1, 2)
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..builder import build_backbone
        # spatial path: 3 stride-2 convs + 1x1
        s = x
        for i, ch in enumerate(self.spatial_channels[:3]):
            s = ConvModule(ch, 7 if i == 0 else 3, stride=2,
                           padding=3 if i == 0 else 1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name=f'spatial{i}')(s, train=train)
        s = ConvModule(self.spatial_channels[3], 1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='spatial_out')(s, train=train)
        # context path: resnet-18 by default
        bb_cfg = dict(self.backbone_cfg or
                      dict(type='ResNet', depth=18,
                           norm_cfg=self.norm_cfg))
        feats = build_backbone({**bb_cfg, 'dtype': self.dtype}
                               )(x, train=train) \
            if False else _SubBackbone(bb_cfg, dtype=self.dtype,
                                       name='context')(x, train=train)
        c16, c32 = feats[-2], feats[-1]
        gap = jnp.mean(c32, axis=(1, 2), keepdims=True)
        gap = ConvModule(self.context_channels[1], 1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='gap_conv')(gap, train=train)

        def arm(f, ch, name):
            y = ConvModule(ch, 3, padding=1, norm_cfg=self.norm_cfg,
                           dtype=self.dtype,
                           name=f'{name}_conv')(f, train=train)
            a = jnp.mean(y, axis=(1, 2), keepdims=True)
            a = ConvModule(ch, 1, norm_cfg=self.norm_cfg,
                           act_cfg={'type': 'Sigmoid'},
                           dtype=self.dtype,
                           name=f'{name}_attn')(a, train=train)
            return y * a

        r32 = arm(c32, self.context_channels[1], 'arm32') + gap
        r32 = resize(r32, size=c16.shape[1:3], mode='bilinear',
                     align_corners=False)
        r32 = ConvModule(self.context_channels[0], 3, padding=1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='refine32')(r32, train=train)
        r16 = arm(c16, self.context_channels[0], 'arm16') + r32
        r16 = resize(r16, size=s.shape[1:3], mode='bilinear',
                     align_corners=False)
        r16 = ConvModule(self.context_channels[0], 3, padding=1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='refine16')(r16, train=train)
        # feature fusion
        cat = jnp.concatenate([s, r16], axis=-1)
        ffm = ConvModule(self.out_channels, 1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='ffm_conv')(cat, train=train)
        a = jnp.mean(ffm, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name='ffm_attn1')(a)
        a = nn.relu(a)
        a = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name='ffm_attn2')(a)
        out = ffm + ffm * nn.sigmoid(a)
        cands = (out, r16, r32)
        return tuple(cands[i] for i in self.out_indices)


class _SubBackbone(nn.Module):
    cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..builder import build_backbone
        return build_backbone({**dict(self.cfg), 'dtype': self.dtype}
                              )(x, train=train)


@BACKBONES.register_module()
class BiSeNetV2(nn.Module):
    """BiSeNetV2 (``bisenetv2.py``): detail branch + semantic branch +
    bilateral guided aggregation."""
    in_channels: int = 3
    detail_channels: Sequence[int] = (64, 64, 128)
    semantic_channels: Sequence[int] = (16, 32, 64, 128)
    semantic_expansion_ratio: int = 6
    bga_channels: int = 128
    out_indices: Sequence[int] = (0, 1, 2, 3, 4)
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .mobilenet import InvertedResidual
        # detail branch: 3 stages stride 2,2,2
        d = x
        for i, ch in enumerate(self.detail_channels):
            d = ConvModule(ch, 3, stride=2, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name=f'detail{i}a')(d, train=train)
            d = ConvModule(ch, 3, padding=1, norm_cfg=self.norm_cfg,
                           dtype=self.dtype,
                           name=f'detail{i}b')(d, train=train)
        # semantic branch
        s = ConvModule(self.semantic_channels[0], 3, stride=2,
                       padding=1, norm_cfg=self.norm_cfg,
                       dtype=self.dtype, name='stem')(x, train=train)
        s = nn.max_pool(s, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        sem_outs = [s]
        for i, ch in enumerate(self.semantic_channels[1:]):
            for b in range(2):
                s = InvertedResidual(
                    ch, stride=2 if b == 0 else 1,
                    expand_ratio=self.semantic_expansion_ratio,
                    norm_cfg=self.norm_cfg, dtype=self.dtype,
                    name=f'sem{i}_{b}')(s, train=train)
            sem_outs.append(s)
        # context embedding
        gap = jnp.mean(s, axis=(1, 2), keepdims=True)
        s = s + ConvModule(s.shape[-1], 1, norm_cfg=self.norm_cfg,
                           dtype=self.dtype,
                           name='ce')(gap, train=train)
        # bilateral guided aggregation
        s_up = resize(s, size=d.shape[1:3], mode='bilinear',
                      align_corners=False)
        s_up = ConvModule(self.bga_channels, 3, padding=1,
                          norm_cfg=self.norm_cfg,
                          act_cfg={'type': 'Sigmoid'},
                          dtype=self.dtype,
                          name='bga_sem')(s_up, train=train)
        d_g = ConvModule(self.bga_channels, 3, padding=1,
                         norm_cfg=self.norm_cfg,
                         act_cfg={'type': 'none'}, dtype=self.dtype,
                         name='bga_det')(d, train=train)
        fused = ConvModule(self.bga_channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bga_out')(d_g * s_up, train=train)
        cands = [fused] + sem_outs
        return tuple(cands[i] for i in self.out_indices
                     if i < len(cands))


@BACKBONES.register_module()
class ICNet(nn.Module):
    """ICNet multi-resolution backbone (``icnet.py``)."""
    backbone_cfg: Optional[dict] = None
    in_channels: int = 3
    layer_channels: Sequence[int] = (512, 2048)
    light_branch_middle_channels: int = 32
    psp_out_channels: int = 512
    out_channels: Sequence[int] = (64, 256, 256)
    norm_cfg: Optional[dict] = None
    align_corners: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # light high-res branch
        hi = x
        for i, (ch, st) in enumerate(
                [(self.light_branch_middle_channels, 2),
                 (self.light_branch_middle_channels, 2),
                 (self.out_channels[0], 2)]):
            hi = ConvModule(ch, 3, stride=st, padding=1,
                            norm_cfg=self.norm_cfg, dtype=self.dtype,
                            name=f'light{i}')(hi, train=train)
        # mid branch: backbone at 1/2 input
        mid_in = resize(x, scale_factor=0.5, mode='bilinear',
                        align_corners=self.align_corners)
        bb_cfg = dict(self.backbone_cfg or
                      dict(type='ResNetV1c', depth=50,
                           dilations=(1, 1, 2, 4),
                           strides=(1, 2, 1, 1),
                           norm_cfg=self.norm_cfg,
                           contract_dilation=True))
        feats = _SubBackbone(bb_cfg, dtype=self.dtype,
                             name='backbone')(mid_in, train=train)
        mid = ConvModule(self.out_channels[1], 1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='mid_proj')(feats[1], train=train)
        # global-context stage over the deepest feature (reference
        # ``icnet.py``: PSPModule pooling (1,2,3,6) -> psp_out_channels
        # bottleneck) — previously psp_out_channels was a dead knob
        from ..decode_heads.psp_head import PPM
        deep = feats[-1]
        psp_outs = [deep] + PPM((1, 2, 3, 6),
                                self.psp_out_channels,
                                self.align_corners,
                                norm_cfg=self.norm_cfg,
                                dtype=self.dtype,
                                name='psp')(deep, train=train)
        deep = ConvModule(self.psp_out_channels, 3, padding=1,
                          norm_cfg=self.norm_cfg, dtype=self.dtype,
                          name='psp_bottleneck')(
                              jnp.concatenate(psp_outs, axis=-1),
                              train=train)
        low = ConvModule(self.out_channels[2], 1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='low_proj')(deep, train=train)
        return (hi, mid, low)
