"""ResNeSt backbone (mirror of ``rsiseg/models/backbones/resnest.py``).

Split-attention bottleneck: the 3x3 conv expands to ``radix`` groups
whose outputs are fused by learned per-channel soft attention.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from ..utils.layers import ConvModule
from .resnet import ResNet, _downsample


class SplitAttentionConv(nn.Module):
    channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    radix: int = 2
    reduction_factor: int = 4
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r, c = self.radix, self.channels
        y = ConvModule(c * r, self.kernel_size, stride=self.stride,
                       padding=self.dilation, dilation=self.dilation,
                       groups=self.groups * r, norm_cfg=self.norm_cfg,
                       dtype=self.dtype, name='conv')(x, train=train)
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, c)
        gap = jnp.mean(splits.sum(axis=3), axis=(1, 2))  # (b, c)
        inter = max(c * r // self.reduction_factor, 32)
        att = nn.Dense(inter, dtype=self.dtype, name='fc1')(gap)
        # mmcv SplAtConv2d: fc1 -> bn1 -> relu -> fc2 — the norm keeps
        # the attention logits scaled before the radix softmax
        att = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           name='fc1_bn')(att)
        att = nn.relu(att)
        att = nn.Dense(c * r, dtype=self.dtype, name='fc2')(att)
        att = jax.nn.softmax(att.reshape(b, r, c), axis=1)
        out = jnp.sum(splits * att[:, None, None, :, :], axis=3)
        return out


class BottleneckS(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    avg_down: bool = True
    avg_down_stride: bool = True
    norm_cfg: Optional[dict] = None
    groups: int = 1
    base_width: int = 4
    base_channels: int = 64
    radix: int = 2
    dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes *
                    (self.base_width / self.base_channels)) * \
            self.groups
        identity = x
        out = ConvModule(width, 1, norm_cfg=self.norm_cfg,
                         dtype=self.dtype, name='conv1')(x, train=train)
        out = SplitAttentionConv(width, 3,
                                 stride=1 if self.avg_down_stride
                                 else self.stride,
                                 dilation=self.dilation,
                                 groups=self.groups, radix=self.radix,
                                 norm_cfg=self.norm_cfg,
                                 dtype=self.dtype,
                                 name='conv2')(out, train=train)
        if self.avg_down_stride and self.stride > 1:
            out = nn.avg_pool(out, (3, 3),
                              strides=(self.stride, self.stride),
                              padding=((1, 1), (1, 1)))
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
class ResNeSt(ResNet):
    groups: int = 1
    base_width: int = 4
    radix: int = 2
    deep_stem: bool = True
    avg_down: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, stage_blocks = ResNet.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        stem_train = train and not self.norm_eval and \
            self.frozen_stages < 0
        half = self.stem_channels // 2
        x = ConvModule(half, 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='stem_conv1')(x, train=stem_train)
        x = ConvModule(half, 3, padding=1, norm_cfg=self.norm_cfg,
                       dtype=self.dtype,
                       name='stem_conv2')(x, train=stem_train)
        x = ConvModule(self.stem_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='stem_conv3')(x, train=stem_train)
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
                    x.shape[-1] != planes * BottleneckS.expansion))
                x = BottleneckS(
                    planes=planes, stride=blk_stride,
                    dilation=blk_dilation, with_downsample=with_down,
                    avg_down=self.avg_down, norm_cfg=self.norm_cfg,
                    groups=self.groups, base_width=self.base_width,
                    base_channels=self.base_channels, radix=self.radix,
                    dtype=self.dtype,
                    name=f'layer{i + 1}_block{b}')(x, train=stage_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
