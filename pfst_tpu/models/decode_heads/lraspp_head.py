"""Lite R-ASPP head for MobileNetV3 (mirror of
``rsiseg/models/decode_heads/lraspp_head.py``)."""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import HEADS
from ..utils.layers import ConvModule


@HEADS.register_module()
class LRASPPHead(nn.Module):
    in_channels: Sequence[int] = (16, 24, 960)
    channels: int = 128
    num_classes: int = 19
    branch_channels: Sequence[int] = (32, 64)
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = (0, 1, 2)
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
        x = feats[-1]
        y = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                       dtype=self.dtype, name='conv_up')(x, train=train)
        # squeeze-and-excite style image branch
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    name='image_pool_conv')(s)
        y = y * nn.sigmoid(s)
        out = y
        for i, low in enumerate(feats[:-1][::-1]):
            out = resize(out, size=low.shape[1:3], mode='bilinear',
                         align_corners=self.align_corners)
            lateral = nn.Conv(self.branch_channels[::-1][i], (1, 1),
                              dtype=self.dtype,
                              name=f'lateral{i}')(low)
            out = jnp.concatenate([out, lateral], axis=-1)
            out = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                             dtype=self.dtype,
                             name=f'fuse{i}')(out, train=train)
        logits = nn.Conv(self.num_classes, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         dtype=self.dtype, name='conv_seg')(out)
        return logits, out
