"""Necks (mirrors of ``rsiseg/models/necks/``): FPN, MultiLevelNeck,
Feature2Pyramid, JPU, ICNeck, MLANeck."""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import NECKS
from ..utils.layers import ConvModule, DepthwiseSeparableConvModule


@NECKS.register_module()
class FPN(nn.Module):
    """Feature Pyramid Network (``necks/fpn.py``)."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 4
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        end = len(self.in_channels) if self.end_level == -1 \
            else self.end_level
        used = list(inputs[self.start_level:end])
        laterals = [
            ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                       act_cfg={'type': 'none'}, dtype=self.dtype,
                       name=f'lateral{i}')(x, train=train)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = resize(laterals[i], size=laterals[i - 1].shape[1:3],
                        mode='nearest')
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            ConvModule(self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg={'type': 'none'},
                       dtype=self.dtype,
                       name=f'fpn_conv{i}')(laterals[i], train=train)
            for i in range(len(laterals))
        ]
        while len(outs) < self.num_outs:
            outs.append(
                nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)


@NECKS.register_module()
class MultiLevelNeck(nn.Module):
    """rescale single/multi-level ViT features (``multilevel_neck.py``)."""
    in_channels: Sequence[int] = (768,) * 4
    out_channels: int = 768
    scales: Sequence[float] = (0.5, 1, 2, 4)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if len(inputs) == 1:
            inputs = inputs * len(self.scales)
        outs = []
        for i, (x, s) in enumerate(zip(inputs, self.scales)):
            x = ConvModule(self.out_channels, 1,
                           act_cfg={'type': 'none'}, dtype=self.dtype,
                           name=f'lateral{i}')(x, train=train)
            if s != 1:
                x = resize(x, scale_factor=s, mode='bilinear',
                           align_corners=False)
            outs.append(
                ConvModule(self.out_channels, 3, padding=1,
                           act_cfg={'type': 'none'}, dtype=self.dtype,
                           name=f'conv{i}')(x, train=train))
        return tuple(outs)


@NECKS.register_module()
class Feature2Pyramid(nn.Module):
    """upsample plain-ViT features into a pyramid
    (``featurepyramid.py``)."""
    embed_dim: int = 768
    rescales: Sequence[float] = (4, 2, 1, 0.5)
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = []
        for i, (x, s) in enumerate(zip(inputs, self.rescales)):
            if s != 1:
                x = resize(x, scale_factor=s, mode='bilinear',
                           align_corners=False)
            outs.append(x)
        return tuple(outs)


@NECKS.register_module()
class JPU(nn.Module):
    """Joint Pyramid Upsampling (``jpu.py``)."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    mid_channels: int = 512
    start_level: int = 0
    end_level: int = -1
    dilations: Sequence[int] = (1, 2, 4, 8)
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        feats = [
            ConvModule(self.mid_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name=f'conv{i}')(x, train=train)
            for i, x in enumerate(inputs)
        ]
        size = feats[0].shape[1:3]
        feats = [
            resize(f, size=size, mode='bilinear',
                   align_corners=self.align_corners) for f in feats
        ]
        cat = jnp.concatenate(feats, axis=-1)
        outs = [
            DepthwiseSeparableConvModule(
                self.mid_channels, 3, padding=d, dilation=d,
                norm_cfg=self.norm_cfg, dtype=self.dtype,
                name=f'dilated{i}')(cat, train=train)
            for i, d in enumerate(self.dilations)
        ]
        out = jnp.concatenate(outs, axis=-1)
        return tuple(inputs[:-1]) + (out,)


@NECKS.register_module()
class ICNeck(nn.Module):
    """ICNet cascade feature fusion (``ic_neck.py``)."""
    in_channels: Sequence[int] = (64, 256, 256)
    out_channels: int = 128
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == 3
        low, mid, high = inputs

        def cff(small, big, idx):
            small_up = resize(small, size=big.shape[1:3],
                              mode='bilinear',
                              align_corners=self.align_corners)
            small_up = ConvModule(self.out_channels, 3, padding=2,
                                  dilation=2, norm_cfg=self.norm_cfg,
                                  act_cfg={'type': 'none'},
                                  dtype=self.dtype,
                                  name=f'cff{idx}_small')(small_up,
                                                          train=train)
            big_c = ConvModule(self.out_channels, 1,
                               norm_cfg=self.norm_cfg,
                               act_cfg={'type': 'none'},
                               dtype=self.dtype,
                               name=f'cff{idx}_big')(big, train=train)
            return nn.relu(small_up + big_c)

        out_mid = cff(high, mid, 0)
        out_low = cff(out_mid, low, 1)
        return (out_low, out_mid, high)


@NECKS.register_module()
class MLANeck(nn.Module):
    """Multi-level aggregation for SETR-MLA (``mla_neck.py``)."""
    in_channels: Sequence[int] = (1024,) * 4
    out_channels: int = 256
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        # top-down cumulative aggregation then 3x3 refinement
        laterals = [
            ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                       dtype=self.dtype,
                       name=f'lateral{i}')(x, train=train)
            for i, x in enumerate(inputs)
        ]
        agg = []
        acc = None
        for i in range(len(laterals) - 1, -1, -1):
            acc = laterals[i] if acc is None else acc + laterals[i]
            agg.insert(0, acc)
        outs = [
            ConvModule(self.out_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name=f'conv{i}')(a, train=train)
            for i, a in enumerate(agg)
        ]
        return tuple(outs)
