"""MixVisionTransformer (SegFormer backbone, mirror of
``rsiseg/models/backbones/mit.py``).

Overlapping patch embeddings, spatial-reduction efficient attention and
Mix-FFN (3x3 depthwise conv in the MLP).  All attention runs as plain
batched matmuls on the MXU; spatial reduction keeps the K/V sequence
short at high resolutions.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .beit import drop_path


class EfficientAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        h, w = hw
        b, n, c = x.shape
        q = nn.Dense(self.dim, dtype=self.dtype, name='q')(x)
        kv_in = x
        if self.sr_ratio > 1:
            xr = x.reshape(b, h, w, c)
            xr = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio),
                         dtype=self.dtype, name='sr')(xr)
            xr = xr.reshape(b, -1, self.dim)
            kv_in = nn.LayerNorm(dtype=self.dtype, name='sr_norm')(xr)
        k = nn.Dense(self.dim, dtype=self.dtype, name='k')(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name='v')(kv_in)
        hd = self.dim // self.num_heads

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(
                0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (hd**-0.5), axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        name='proj')(out.astype(self.dtype))


class MixFFN(nn.Module):
    dim: int
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        h, w = hw
        b, n, c = x.shape
        hidden = self.dim * self.expansion
        x = nn.Dense(hidden, dtype=self.dtype, name='fc1')(x)
        xr = x.reshape(b, h, w, hidden)
        xr = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                     feature_group_count=hidden, dtype=self.dtype,
                     name='dwconv')(xr)
        x = nn.gelu(xr.reshape(b, n, hidden), approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name='fc2')(x)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        def _dp(z):
            if not train or self.drop_path_rate == 0.0:
                return z
            return drop_path(z, self.drop_path_rate, False,
                             self.make_rng('dropout'))

        y = nn.LayerNorm(dtype=self.dtype, name='norm1')(x)
        x = x + _dp(EfficientAttention(self.dim, self.num_heads,
                                       self.sr_ratio, dtype=self.dtype,
                                       name='attn')(y, hw, train=train))
        y = nn.LayerNorm(dtype=self.dtype, name='norm2')(x)
        x = x + _dp(MixFFN(self.dim, self.mlp_ratio, dtype=self.dtype,
                           name='ffn')(y, hw, train=train))
        return x


@BACKBONES.register_module()
class MixVisionTransformer(nn.Module):
    in_channels: int = 3
    embed_dims: int = 32
    num_stages: int = 4
    num_layers: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    mlp_ratio: int = 4
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_cfg: Optional[dict] = None
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        # (self, x, hw, train): hw is a static python tuple
        block_cls = (nn.remat(MiTBlock, static_argnums=(2, 3))
                     if self.with_cp else MiTBlock)
        import numpy as np
        dpr = np.linspace(0, self.drop_path_rate,
                          sum(self.num_layers[:self.num_stages]))
        for i in range(self.num_stages):
            dim = self.embed_dims * self.num_heads[i]
            p = self.patch_sizes[i]
            x = nn.Conv(dim, (p, p),
                        strides=(self.strides[i], self.strides[i]),
                        padding=((p // 2, p // 2), (p // 2, p // 2)),
                        dtype=self.dtype, name=f'patch_embed{i}')(x)
            b, h, w, c = x.shape
            seq = nn.LayerNorm(dtype=self.dtype,
                               name=f'embed_norm{i}')(
                                   x.reshape(b, h * w, c))
            for j in range(self.num_layers[i]):
                blk_idx = sum(self.num_layers[:i]) + j
                seq = block_cls(dim, self.num_heads[i],
                                self.sr_ratios[i], self.mlp_ratio,
                                drop_path_rate=float(dpr[blk_idx]),
                                dtype=self.dtype,
                                name=f'stage{i}_block{j}')(
                                    seq, (h, w), train)
            seq = nn.LayerNorm(dtype=self.dtype,
                               name=f'stage_norm{i}')(seq)
            x = seq.reshape(b, h, w, dim)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module(name='MiT')
class MiT(MixVisionTransformer):
    """alias used by some configs."""
