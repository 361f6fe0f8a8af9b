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
