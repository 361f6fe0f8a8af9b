"""ASPP heads: DeepLabV3 and DeepLabV3+ (flax.linen, NHWC).

Re-implements ``rsiseg/models/decode_heads/aspp_head.py:65-126`` and
``sep_aspp_head.py:30-111``.  The returned ``decoded_features`` is the
post-ASPP bottleneck output *before* the c1 skip concat, matching
``sep_aspp_head.py:92`` (``features = output.clone()``) — the PFGST
loss consumes exactly this tensor when ``use_decoded_feats=True``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops import adaptive_avg_pool_1x1, resize
from ..builder import HEADS
from ..utils.layers import ConvModule, DepthwiseSeparableConvModule
from .base import ClsSeg, transform_inputs


class ASPPModule(nn.Module):
    """Parallel atrous branches (``aspp_head.py:11-50``)."""
    dilations: Sequence[int]
    channels: int
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    separable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, dilation in enumerate(self.dilations):
            if dilation > 1 and self.separable:
                out = DepthwiseSeparableConvModule(
                    self.channels, 3, dilation=dilation, padding=dilation,
                    norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                    dtype=self.dtype, name=f'branch{i}')(x, train=train)
            else:
                out = ConvModule(
                    self.channels,
                    1 if dilation == 1 else 3,
                    dilation=dilation,
                    padding=0 if dilation == 1 else dilation,
                    norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                    dtype=self.dtype, name=f'branch{i}')(x, train=train)
            outs.append(out)
        return outs


@HEADS.register_module()
class ASPPHead(nn.Module):
    """DeepLabV3 head (``aspp_head.py:53-126``)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    dilations: Sequence[int] = (1, 6, 12, 18)
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = 3
    input_transform: Optional[str] = None
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    def image_pool_and_branches(self, x, train):
        pooled = adaptive_avg_pool_1x1(x)
        pooled = ConvModule(
            self.channels, 1, norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            dtype=self.dtype, name='image_pool_conv')(pooled, train=train)
        pooled = resize(pooled, size=x.shape[1:3], mode='bilinear',
                        align_corners=self.align_corners)
        return pooled

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = transform_inputs(inputs, self.in_index, self.input_transform,
                             self.align_corners)
        aspp_outs = [self.image_pool_and_branches(x, train)]
        aspp_outs.extend(
            ASPPModule(self.dilations, self.channels, self.norm_cfg,
                       self.act_cfg, dtype=self.dtype,
                       name='aspp_modules')(x, train=train))
        cat = jnp.concatenate(aspp_outs, axis=-1)
        feats = ConvModule(
            self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, dtype=self.dtype,
            name='bottleneck')(cat, train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats


@HEADS.register_module()
class DepthwiseSeparableASPPHead(nn.Module):
    """DeepLabV3+ head (``sep_aspp_head.py:30-111``)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    dilations: Sequence[int] = (1, 12, 24, 36)
    c1_in_channels: int = 256
    c1_channels: int = 48
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = 3
    input_transform: Optional[str] = None
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = transform_inputs(inputs, self.in_index, self.input_transform,
                             self.align_corners)
        pooled = adaptive_avg_pool_1x1(x)
        pooled = ConvModule(
            self.channels, 1, norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
            dtype=self.dtype, name='image_pool_conv')(pooled, train=train)
        pooled = resize(pooled, size=x.shape[1:3], mode='bilinear',
                        align_corners=self.align_corners)
        aspp_outs = [pooled]
        aspp_outs.extend(
            ASPPModule(self.dilations, self.channels, self.norm_cfg,
                       self.act_cfg, separable=True, dtype=self.dtype,
                       name='aspp_modules')(x, train=train))
        cat = jnp.concatenate(aspp_outs, axis=-1)
        output = ConvModule(
            self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, dtype=self.dtype,
            name='bottleneck')(cat, train=train)
        features = output  # pre-c1 decoded features (sep_aspp_head.py:92)

        if self.c1_in_channels > 0:
            c1 = ConvModule(
                self.c1_channels, 1, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg, dtype=self.dtype,
                name='c1_bottleneck')(inputs[0], train=train)
            output = resize(output, size=c1.shape[1:3], mode='bilinear',
                            align_corners=self.align_corners)
            output = jnp.concatenate([output, c1], axis=-1)
        output = DepthwiseSeparableConvModule(
            self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, dtype=self.dtype,
            name='sep_bottleneck1')(output, train=train)
        output = DepthwiseSeparableConvModule(
            self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, dtype=self.dtype,
            name='sep_bottleneck2')(output, train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(output, train=train)
        return logits, features
