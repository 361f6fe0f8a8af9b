"""SegFormer MLP head (mirror of
``rsiseg/models/decode_heads/segformer_head.py``)."""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import HEADS
from ..utils.layers import ConvModule
from .base import ClsSeg


@HEADS.register_module()
class SegformerHead(nn.Module):
    in_channels: Sequence[int] = (32, 64, 160, 256)
    channels: int = 256
    num_classes: int = 19
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'
    align_corners: bool = False
    interpolate_mode: str = 'bilinear'
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        feats = [inputs[i] for i in self.in_index]
        size0 = feats[0].shape[1:3]
        projected = []
        for i, f in enumerate(feats):
            p = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                           act_cfg=self.act_cfg, dtype=self.dtype,
                           name=f'proj{i}')(f, train=train)
            projected.append(
                resize(p, size=size0, mode=self.interpolate_mode,
                       align_corners=self.align_corners))
        fused = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                           act_cfg=self.act_cfg, dtype=self.dtype,
                           name='fusion')(
                               jnp.concatenate(projected, axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(fused, train=train)
        return logits, fused
