"""UNet backbone (mirror of ``rsiseg/models/backbones/unet.py``).

Encoder-decoder with skip connections; returns per-decoder-stage
feature maps (deepest first like the reference's out order: the decode
head consumes the last, highest-resolution map).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import BACKBONES
from ..utils.layers import ConvModule


class BasicConvBlock(nn.Module):
    out_channels: int
    num_convs: int = 2
    stride: int = 1
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_convs):
            x = ConvModule(
                self.out_channels, 3,
                stride=self.stride if i == 0 else 1,
                padding=1 if i == 0 else self.dilation,
                dilation=1 if i == 0 else self.dilation,
                norm_cfg=self.norm_cfg, dtype=self.dtype,
                name=f'conv{i}')(x, train=train)
        return x


@BACKBONES.register_module()
class UNet(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 5
    strides: Sequence[int] = (1, 1, 1, 1, 1)
    enc_num_convs: Sequence[int] = (2, 2, 2, 2, 2)
    dec_num_convs: Sequence[int] = (2, 2, 2, 2)
    downsamples: Sequence[bool] = (True, True, True, True)
    enc_dilations: Sequence[int] = (1, 1, 1, 1, 1)
    dec_dilations: Sequence[int] = (1, 1, 1, 1)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None
    norm_eval: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = train and not self.norm_eval
        enc_outs = []
        for i in range(self.num_stages):
            ch = self.base_channels * 2**i
            if i > 0 and self.downsamples[i - 1]:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = BasicConvBlock(ch, self.enc_num_convs[i],
                               stride=self.strides[i],
                               dilation=self.enc_dilations[i],
                               norm_cfg=self.norm_cfg, dtype=self.dtype,
                               name=f'enc{i}')(x, train=t)
            enc_outs.append(x)

        outs = [enc_outs[-1]]
        y = enc_outs[-1]
        for i in range(self.num_stages - 2, -1, -1):
            skip = enc_outs[i]
            y = resize(y, size=skip.shape[1:3], mode='bilinear',
                       align_corners=False)
            y = ConvModule(skip.shape[-1], 1, norm_cfg=self.norm_cfg,
                           dtype=self.dtype,
                           name=f'up{i}')(y, train=t)
            y = jnp.concatenate([skip, y], axis=-1)
            y = BasicConvBlock(skip.shape[-1],
                               self.dec_num_convs[i],
                               dilation=self.dec_dilations[i],
                               norm_cfg=self.norm_cfg, dtype=self.dtype,
                               name=f'dec{i}')(y, train=t)
            outs.append(y)
        return tuple(outs)
