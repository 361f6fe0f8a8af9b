"""HRNet backbone (mirror of ``rsiseg/models/backbones/hrnet.py``).

Parallel multi-resolution streams with repeated cross-resolution
fusion.  The module consumes the standard mmseg ``extra`` stage config
(num_modules/num_branches/num_blocks/num_channels per stage).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import BACKBONES
from ..utils.layers import ConvModule
from .resnet import BasicBlock, Bottleneck

HRNET18_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                num_blocks=(4,), num_channels=(64,)),
    stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                num_blocks=(4, 4), num_channels=(18, 36)),
    stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                num_blocks=(4, 4, 4), num_channels=(18, 36, 72)),
    stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                num_blocks=(4, 4, 4, 4),
                num_channels=(18, 36, 72, 144)))

_BLOCKS = {'BASIC': BasicBlock, 'BOTTLENECK': Bottleneck}


class HRModule(nn.Module):
    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    norm_cfg: Optional[dict] = None
    multiscale_output: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        block_cls = _BLOCKS[self.block]
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            ch = self.num_channels[b] * block_cls.expansion
            for i in range(self.num_blocks[b]):
                x = block_cls(
                    planes=self.num_channels[b],
                    with_downsample=(x.shape[-1] != ch and i == 0),
                    norm_cfg=self.norm_cfg, dtype=self.dtype,
                    name=f'branch{b}_block{i}')(x, train=train)
            outs.append(x)
        # fuse
        n_out = self.num_branches if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            acc = None
            for j in range(self.num_branches):
                y = outs[j]
                if j > i:  # upsample lower-res branch
                    y = ConvModule(
                        self.num_channels[i] * block_cls.expansion, 1,
                        norm_cfg=self.norm_cfg,
                        act_cfg={'type': 'none'}, dtype=self.dtype,
                        name=f'fuse{i}_{j}')(y, train=train)
                    y = resize(y, size=outs[i].shape[1:3],
                               mode='bilinear', align_corners=False)
                elif j < i:  # strided convs down
                    for s in range(i - j):
                        last = s == i - j - 1
                        y = ConvModule(
                            (self.num_channels[i] * block_cls.expansion
                             if last else y.shape[-1]),
                            3, stride=2, padding=1,
                            norm_cfg=self.norm_cfg,
                            act_cfg={'type': 'none'} if last else None,
                            dtype=self.dtype,
                            name=f'fuse{i}_{j}_down{s}')(y, train=train)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


@BACKBONES.register_module()
class HRNet(nn.Module):
    extra: Optional[dict] = None
    in_channels: int = 3
    norm_cfg: Optional[dict] = None
    norm_eval: bool = False
    frozen_stages: int = -1
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = {k: dict(v) for k, v in
                 (self.extra or HRNET18_EXTRA).items()}
        t = train and not self.norm_eval
        x = ConvModule(64, 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='stem1')(x, train=t)
        x = ConvModule(64, 3, stride=2, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='stem2')(x, train=t)

        # stage 1
        s1 = extra['stage1']
        block_cls = _BLOCKS[s1['block']]
        for i in range(s1['num_blocks'][0]):
            x = block_cls(planes=s1['num_channels'][0],
                          with_downsample=(i == 0),
                          norm_cfg=self.norm_cfg, dtype=self.dtype,
                          name=f'layer1_block{i}')(x, train=t)
        xs = [x]

        for si, name in enumerate(('stage2', 'stage3', 'stage4')):
            cfg = extra[name]
            nb = cfg['num_branches']
            block_cls = _BLOCKS[cfg['block']]
            # transition: adapt/extend branch list
            new_xs = []
            for b in range(nb):
                target_ch = cfg['num_channels'][b] * block_cls.expansion
                if b < len(xs):
                    y = xs[b]
                    if y.shape[-1] != target_ch:
                        y = ConvModule(target_ch, 3, padding=1,
                                       norm_cfg=self.norm_cfg,
                                       dtype=self.dtype,
                                       name=f'{name}_trans{b}')(
                                           y, train=t)
                else:
                    y = ConvModule(target_ch, 3, stride=2, padding=1,
                                   norm_cfg=self.norm_cfg,
                                   dtype=self.dtype,
                                   name=f'{name}_trans{b}')(
                                       xs[-1], train=t)
                new_xs.append(y)
            xs = new_xs
            for m in range(cfg['num_modules']):
                xs = HRModule(nb, cfg['block'], cfg['num_blocks'],
                              cfg['num_channels'],
                              norm_cfg=self.norm_cfg, dtype=self.dtype,
                              name=f'{name}_module{m}')(xs, train=t)
        return tuple(xs)
