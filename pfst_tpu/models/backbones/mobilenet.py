"""MobileNetV2 / V3 backbones (mirrors of
``rsiseg/models/backbones/mobilenet_v2.py`` / ``mobilenet_v3.py``).

Inverted residual blocks with per-stage stride/dilation control
(dilated final stages for OS8 segmentation like the reference).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from ..utils.layers import ConvModule


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    with_se: bool = False
    act: str = 'ReLU6'
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        identity = x
        out = x
        if self.expand_ratio != 1:
            out = ConvModule(hidden, 1, norm_cfg=self.norm_cfg,
                             act_cfg={'type': self.act},
                             dtype=self.dtype,
                             name='expand')(out, train=train)
        out = ConvModule(hidden, 3, stride=self.stride,
                         padding=self.dilation, dilation=self.dilation,
                         groups=hidden, norm_cfg=self.norm_cfg,
                         act_cfg={'type': self.act}, dtype=self.dtype,
                         name='depthwise')(out, train=train)
        if self.with_se:
            se = jnp.mean(out, axis=(1, 2), keepdims=True)
            se = nn.Conv(max(hidden // 4, 8), (1, 1), dtype=self.dtype,
                         name='se_reduce')(se)
            se = nn.relu(se)
            se = nn.Conv(hidden, (1, 1), dtype=self.dtype,
                         name='se_expand')(se)
            out = out * nn.hard_sigmoid(se)
        out = ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                         act_cfg={'type': 'none'}, dtype=self.dtype,
                         name='project')(out, train=train)
        if self.stride == 1 and in_ch == self.out_channels:
            out = out + identity
        return out


@BACKBONES.register_module()
class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    strides: Sequence[int] = (1, 2, 2, 2, 1, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1)
    out_indices: Sequence[int] = (1, 2, 4, 6)
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    norm_eval: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    # (expand_ratio, channel, num_blocks) per stage, MobileNetV2 paper
    arch = [(1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4), (6, 96, 3),
            (6, 160, 3), (6, 320, 1)]

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = train and not self.norm_eval
        ch = int(32 * self.widen_factor)
        x = ConvModule(ch, 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, act_cfg={'type': 'ReLU6'},
                       dtype=self.dtype, name='stem')(x, train=t)
        outs = []
        for i, (er, c, n) in enumerate(self.arch):
            out_ch = int(c * self.widen_factor)
            for b in range(n):
                x = InvertedResidual(
                    out_ch,
                    stride=self.strides[i] if b == 0 else 1,
                    expand_ratio=er,
                    dilation=self.dilations[i],
                    norm_cfg=self.norm_cfg, dtype=self.dtype,
                    name=f'layer{i + 1}_block{b}')(x, train=t)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class MobileNetV3(nn.Module):
    """MobileNetV3-large/small with SE + hard-swish blocks."""
    arch: str = 'large'
    out_indices: Sequence[int] = (1, 3, 16)
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    norm_eval: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    # (kernel, expand_ch, out_ch, se, act, stride)
    settings = {
        'small': [(3, 16, 16, True, 'ReLU', 2),
                  (3, 72, 24, False, 'ReLU', 2),
                  (3, 88, 24, False, 'ReLU', 1),
                  (5, 96, 40, True, 'HSwish', 2),
                  (5, 240, 40, True, 'HSwish', 1),
                  (5, 240, 40, True, 'HSwish', 1),
                  (5, 120, 48, True, 'HSwish', 1),
                  (5, 144, 48, True, 'HSwish', 1),
                  (5, 288, 96, True, 'HSwish', 2),
                  (5, 576, 96, True, 'HSwish', 1),
                  (5, 576, 96, True, 'HSwish', 1)],
        'large': [(3, 16, 16, False, 'ReLU', 1),
                  (3, 64, 24, False, 'ReLU', 2),
                  (3, 72, 24, False, 'ReLU', 1),
                  (5, 72, 40, True, 'ReLU', 2),
                  (5, 120, 40, True, 'ReLU', 1),
                  (5, 120, 40, True, 'ReLU', 1),
                  (3, 240, 80, False, 'HSwish', 2),
                  (3, 200, 80, False, 'HSwish', 1),
                  (3, 184, 80, False, 'HSwish', 1),
                  (3, 184, 80, False, 'HSwish', 1),
                  (3, 480, 112, True, 'HSwish', 1),
                  (3, 672, 112, True, 'HSwish', 1),
                  (5, 672, 160, True, 'HSwish', 2),
                  (5, 960, 160, True, 'HSwish', 1),
                  (5, 960, 160, True, 'HSwish', 1)],
    }

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = train and not self.norm_eval
        x = ConvModule(16, 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg,
                       act_cfg={'type': 'HSwish'}, dtype=self.dtype,
                       name='stem')(x, train=t)
        outs = [x] if 0 in self.out_indices else []
        layers = self.settings[self.arch]
        for i, (k, exp, out_ch, se, act, stride) in enumerate(layers):
            in_ch = x.shape[-1]
            identity = x
            h = ConvModule(exp, 1, norm_cfg=self.norm_cfg,
                           act_cfg={'type': act}, dtype=self.dtype,
                           name=f'b{i}_expand')(x, train=t) \
                if exp != in_ch else x
            h = ConvModule(exp, k, stride=stride, padding=k // 2,
                           groups=exp, norm_cfg=self.norm_cfg,
                           act_cfg={'type': act}, dtype=self.dtype,
                           name=f'b{i}_dw')(h, train=t)
            if se:
                s = jnp.mean(h, axis=(1, 2), keepdims=True)
                s = nn.Conv(max(exp // 4, 8), (1, 1), dtype=self.dtype,
                            name=f'b{i}_se1')(s)
                s = nn.relu(s)
                s = nn.Conv(exp, (1, 1), dtype=self.dtype,
                            name=f'b{i}_se2')(s)
                h = h * nn.hard_sigmoid(s)
            h = ConvModule(out_ch, 1, norm_cfg=self.norm_cfg,
                           act_cfg={'type': 'none'}, dtype=self.dtype,
                           name=f'b{i}_project')(h, train=t)
            if stride == 1 and in_ch == out_ch:
                h = h + identity
            x = h
            if (i + 1) in self.out_indices:
                outs.append(x)
        last = 576 if self.arch == 'small' else 960
        x = ConvModule(last, 1, norm_cfg=self.norm_cfg,
                       act_cfg={'type': 'HSwish'}, dtype=self.dtype,
                       name='final')(x, train=t)
        if len(layers) + 1 in self.out_indices or \
                16 in self.out_indices:
            outs.append(x)
        return tuple(outs)
