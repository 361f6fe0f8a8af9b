"""UPerNet head (mirror of ``rsiseg/models/decode_heads/uper_head.py``).

PSP module on the deepest level + top-down FPN fusion over all levels.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import HEADS
from ..utils.layers import ConvModule
from .base import ClsSeg
from .psp_head import PPM


@HEADS.register_module()
class UPerHead(nn.Module):
    in_channels: Sequence[int] = (96, 192, 384, 768)
    channels: int = 512
    num_classes: int = 19
    pool_scales: Sequence[int] = (1, 2, 3, 6)
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

        # PSP on the last level
        psp_outs = [feats[-1]]
        psp_outs.extend(
            PPM(self.pool_scales, self.channels, self.align_corners,
                self.norm_cfg, self.act_cfg, dtype=self.dtype,
                name='ppm')(feats[-1], train=train))
        top = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                         dtype=self.dtype, name='psp_bottleneck')(
                             jnp.concatenate(psp_outs, axis=-1),
                             train=train)

        laterals = [
            ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                       act_cfg=self.act_cfg, dtype=self.dtype,
                       name=f'lateral{i}')(feats[i], train=train)
            for i in range(len(feats) - 1)
        ] + [top]

        for i in range(len(laterals) - 1, 0, -1):
            up = resize(laterals[i], size=laterals[i - 1].shape[1:3],
                        mode='bilinear',
                        align_corners=self.align_corners)
            laterals[i - 1] = laterals[i - 1] + up

        fpn_outs = [
            ConvModule(self.channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                       dtype=self.dtype,
                       name=f'fpn_conv{i}')(laterals[i], train=train)
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]

        size0 = fpn_outs[0].shape[1:3]
        fpn_outs = [
            resize(f, size=size0, mode='bilinear',
                   align_corners=self.align_corners) for f in fpn_outs
        ]
        feats_out = ConvModule(
            self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, dtype=self.dtype,
            name='fpn_bottleneck')(jnp.concatenate(fpn_outs, axis=-1),
                                   train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats_out,
                                                      train=train)
        return logits, feats_out
