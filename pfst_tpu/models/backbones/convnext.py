"""ConvNeXt backbone (counterpart of the mmcls ``ConvNeXt`` consumed by
the reference's ``configs/_base_/models/upernet_convnext.py``).

Pure-conv design maps directly onto the MXU: 4x4/4 patchify stem, per
stage N blocks of [7x7 depthwise conv -> LayerNorm -> 1x1 expand x4 ->
GELU -> 1x1 project -> layer scale -> residual], LN + 2x2/2 conv
downsample between stages, per-output LayerNorm.  Channels-last
throughout (native TPU layout).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES

ARCH = {
    'tiny': dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    'small': dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    'base': dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    'large': dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    'xlarge': dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init_value: float = 1e-6
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        x = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim,
                    dtype=self.dtype, name='dwconv')(x)
        x = nn.LayerNorm(dtype=self.dtype, name='norm')(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name='pwconv1')(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name='pwconv2')(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                'gamma',
                lambda _, s: jnp.full(s, self.layer_scale_init_value,
                                      self.dtype), (self.dim,))
            x = x * gamma
        if self.drop_path > 0 and train and self.has_rng('dropout'):
            keep = 1.0 - self.drop_path
            mask = jax.random.bernoulli(
                self.make_rng('dropout'), keep,
                (x.shape[0],) + (1,) * (x.ndim - 1))
            x = x * mask / keep
        return shortcut + x


@BACKBONES.register_module()
class ConvNeXt(nn.Module):
    """4-stage ConvNeXt; returns the feature pyramid at out_indices."""

    arch: str = 'tiny'
    out_indices: Sequence[int] = (0, 1, 2, 3)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    frozen_stages: int = -1
    gap_before_final_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = ARCH[self.arch] if isinstance(self.arch, str) else \
            dict(self.arch)
        depths, dims = spec['depths'], spec['dims']
        total = sum(depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        outs = []
        cur = 0
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            if i == 0:
                x = nn.Conv(dim, (4, 4), strides=(4, 4),
                            dtype=self.dtype, name='stem_conv')(x)
                x = nn.LayerNorm(dtype=self.dtype, name='stem_norm')(x)
            else:
                x = nn.LayerNorm(dtype=self.dtype,
                                 name=f'down_norm{i}')(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2),
                            dtype=self.dtype, name=f'down_conv{i}')(x)
            for j in range(depth):
                x = ConvNeXtBlock(
                    dim, self.layer_scale_init_value, dpr[cur + j],
                    dtype=self.dtype,
                    name=f'stage{i}_block{j}')(x, train=train)
            cur += depth
            if i in self.out_indices:
                outs.append(nn.LayerNorm(dtype=self.dtype,
                                         name=f'out_norm{i}')(x))
        return tuple(outs)
