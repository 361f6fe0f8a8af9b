"""FCN head (auxiliary head of the PFST configs).

Re-implements ``rsiseg/models/decode_heads/fcn_head.py:11`` — a stack of
``num_convs`` 3x3 conv+BN+ReLU blocks, optional input concat, then the
dropout + 1x1 classifier.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS
from ..utils.layers import ConvModule
from .base import ClsSeg, transform_inputs


@HEADS.register_module()
class FCNHead(nn.Module):
    in_channels: int = 1024
    channels: int = 256
    num_classes: int = 19
    num_convs: int = 2
    kernel_size: int = 3
    concat_input: bool = True
    dilation: int = 1
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = 2
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
        feats = x
        conv_padding = (self.kernel_size // 2) * self.dilation
        for i in range(self.num_convs):
            feats = ConvModule(
                self.channels, self.kernel_size, padding=conv_padding,
                dilation=self.dilation, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg, dtype=self.dtype,
                name=f'conv{i}')(feats, train=train)
        if self.num_convs == 0:
            feats = x
        if self.concat_input:
            feats = ConvModule(
                self.channels, self.kernel_size,
                padding=self.kernel_size // 2, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg, dtype=self.dtype,
                name='conv_cat')(jnp.concatenate([x, feats], axis=-1),
                                 train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats


@HEADS.register_module()
class DepthwiseSeparableFCNHead(nn.Module):
    """FCN head with depthwise-separable convs (counterpart of mmseg's
    ``sep_fcn_head.py``; the Fast-SCNN default head)."""

    in_channels: int = 128
    channels: int = 128
    num_classes: int = 19
    num_convs: int = 1
    kernel_size: int = 3
    concat_input: bool = False
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = -1
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
        from ..utils.layers import DepthwiseSeparableConvModule
        x = transform_inputs(inputs, self.in_index, self.input_transform,
                             self.align_corners)
        feats = x
        for i in range(self.num_convs):
            feats = DepthwiseSeparableConvModule(
                self.channels, self.kernel_size,
                padding=self.kernel_size // 2, norm_cfg=self.norm_cfg,
                dtype=self.dtype, name=f'conv{i}')(feats, train=train)
        if self.concat_input:
            feats = DepthwiseSeparableConvModule(
                self.channels, self.kernel_size,
                padding=self.kernel_size // 2, norm_cfg=self.norm_cfg,
                dtype=self.dtype,
                name='conv_cat')(jnp.concatenate([x, feats], axis=-1),
                                 train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats


@HEADS.register_module()
class FPNHead(nn.Module):
    """Semantic-FPN head (counterpart of mmseg's ``fpn_head.py``): each
    pyramid level gets ceil(log2(stride ratio)) conv+2x-upsample stages
    down to the finest level, outputs are summed and classified."""

    in_channels: Sequence[int] = (256, 256, 256, 256)
    channels: int = 128
    num_classes: int = 19
    feature_strides: Sequence[int] = (4, 8, 16, 32)
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
        import math

        from ...ops import resize
        xs = transform_inputs(inputs, self.in_index,
                              self.input_transform or 'multiple_select',
                              self.align_corners)
        base = self.feature_strides[0]
        out = None
        for i, x in enumerate(xs):
            n_up = max(1, int(math.log2(self.feature_strides[i] //
                                        base))) \
                if self.feature_strides[i] != base else 1
            for j in range(n_up):
                x = ConvModule(self.channels, 3, padding=1,
                               norm_cfg=self.norm_cfg, dtype=self.dtype,
                               name=f'scale{i}_conv{j}')(x, train=train)
                if self.feature_strides[i] != base:
                    x = resize(x, size=(x.shape[1] * 2, x.shape[2] * 2),
                               mode='bilinear',
                               align_corners=self.align_corners)
            out = x if out is None else out + x
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(out, train=train)
        return logits, out
