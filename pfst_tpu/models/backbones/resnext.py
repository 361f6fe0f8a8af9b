"""ResNeXt backbone (mirror of ``rsiseg/models/backbones/resnext.py``).

Grouped 3x3 bottleneck convs with width scaling
(width = planes * base_width/base_channels * groups).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from ..utils.layers import ConvModule
from .resnet import ResNet, _downsample


class BottleneckX(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    avg_down: bool = False
    norm_cfg: Optional[dict] = None
    groups: int = 32
    base_width: int = 4
    base_channels: int = 64
    dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = math.floor(self.planes *
                           (self.base_width / self.base_channels)) * \
            self.groups
        identity = x
        out = ConvModule(width, 1, norm_cfg=self.norm_cfg,
                         dtype=self.dtype, name='conv1')(x, train=train)
        out = ConvModule(width, 3, stride=self.stride,
                         padding=self.dilation, dilation=self.dilation,
                         groups=self.groups, norm_cfg=self.norm_cfg,
                         dtype=self.dtype, name='conv2')(out, train=train)
        out = ConvModule(self.planes * self.expansion, 1,
                         norm_cfg=self.norm_cfg,
                         act_cfg={'type': 'none'}, dtype=self.dtype,
                         name='conv3')(out, train=train)
        if self.with_downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, self.avg_down,
                                   self.norm_cfg, self.dtype, train)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class ResNeXt(ResNet):
    groups: int = 32
    base_width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        # identical stage plan to ResNet but with grouped bottlenecks
        _, stage_blocks = ResNet.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]

        stem_train = train and not self.norm_eval and \
            self.frozen_stages < 0
        x = ConvModule(self.stem_channels, 7, stride=2, padding=3,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='conv1')(x, train=stem_train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            stride = self.strides[i]
            dilation = self.dilations[i]
            stage_train = self._stage_train(i, train)
            for b in range(num_blocks):
                blk_dilation = dilation // 2 if (
                    b == 0 and dilation > 1 and
                    self.contract_dilation) else dilation
                blk_stride = stride if b == 0 else 1
                with_down = (b == 0 and (
                    blk_stride != 1 or
                    x.shape[-1] != planes * BottleneckX.expansion))
                x = BottleneckX(
                    planes=planes, stride=blk_stride,
                    dilation=blk_dilation, with_downsample=with_down,
                    avg_down=self.avg_down, norm_cfg=self.norm_cfg,
                    groups=self.groups, base_width=self.base_width,
                    base_channels=self.base_channels, dtype=self.dtype,
                    name=f'layer{i + 1}_block{b}')(x, train=stage_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
