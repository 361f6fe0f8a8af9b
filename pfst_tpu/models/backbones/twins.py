"""Twins backbones (mirror of ``rsiseg/models/backbones/twins.py``).

PCPVT: pyramid ViT with conditional position encodings (depthwise conv
PEG) and global subsampled attention (the MiT efficient attention).
SVT: alternates locally-grouped (windowed) and global subsampled
attention.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from .beit import drop_path
from .mit import EfficientAttention, MixFFN


class PEG(nn.Module):
    """conditional position encoding: 3x3 depthwise conv residual."""
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq, hw):
        h, w = hw
        b, n, c = seq.shape
        x = seq.reshape(b, h, w, c)
        x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=c, dtype=self.dtype,
                    name='proj')(x)
        return seq + x.reshape(b, n, c)


class LocalAttention(nn.Module):
    """locally-grouped self-attention (SVT LSA)."""
    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq, hw, train: bool = False):
        h, w = hw
        b, n, c = seq.shape
        ws = min(self.window_size, h, w)
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        x = seq.reshape(b, h, w, c)
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name='qkv')(x)
        qkv = qkv.reshape(x.shape[0], ws * ws, 3, self.num_heads,
                          hd).transpose(2, 0, 3, 1, 4)
        attn = jax.nn.softmax(
            jnp.einsum('bhqd,bhkd->bhqk', qkv[0], qkv[1],
                       preferred_element_type=jnp.float32) * hd**-0.5,
            axis=-1)
        o = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(qkv[2].dtype),
                       qkv[2], preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(x.shape[0], ws * ws,
                                            self.dim)
        o = nn.Dense(self.dim, dtype=self.dtype,
                     name='proj')(o.astype(self.dtype))
        o = o.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        return o[:, :h, :w].reshape(b, n, c)


class TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    window_size: int = 0  # >0 -> locally-grouped attention
    mlp_ratio: int = 4
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq, hw, train: bool = False):
        def _dp(z):
            if not train or self.drop_path_rate == 0.0:
                return z
            return drop_path(z, self.drop_path_rate, False,
                             self.make_rng('dropout'))

        y = nn.LayerNorm(dtype=self.dtype, name='norm1')(seq)
        if self.window_size > 0:
            attn = LocalAttention(self.dim, self.num_heads,
                                  self.window_size, dtype=self.dtype,
                                  name='attn')(y, hw, train=train)
        else:
            attn = EfficientAttention(self.dim, self.num_heads,
                                      self.sr_ratio, dtype=self.dtype,
                                      name='attn')(y, hw, train=train)
        seq = seq + _dp(attn)
        y = nn.LayerNorm(dtype=self.dtype, name='norm2')(seq)
        seq = seq + _dp(MixFFN(self.dim, self.mlp_ratio,
                               dtype=self.dtype,
                               name='ffn')(y, hw, train=train))
        return seq


@BACKBONES.register_module()
class PCPVT(nn.Module):
    in_channels: int = 3
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    windows: Sequence[int] = (0, 0, 0, 0)  # SVT overrides
    drop_path_rate: float = 0.0
    norm_cfg: Optional[dict] = None
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        # (self, seq, hw, train): hw is a static python tuple
        block_cls = (nn.remat(TwinsBlock, static_argnums=(2, 3))
                     if self.with_cp else TwinsBlock)
        import numpy as np
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        for i in range(len(self.depths)):
            p = self.patch_sizes[i]
            dim = self.embed_dims[i]
            x = nn.Conv(dim, (p, p), strides=(p, p), dtype=self.dtype,
                        name=f'patch_embed{i}')(x)
            b, h, w, c = x.shape
            seq = nn.LayerNorm(dtype=self.dtype,
                               name=f'embed_norm{i}')(
                                   x.reshape(b, h * w, c))
            for j in range(self.depths[i]):
                win = self.windows[i] if j % 2 == 0 else 0
                blk_idx = sum(self.depths[:i]) + j
                seq = block_cls(dim, self.num_heads[i],
                                self.sr_ratios[i], window_size=win,
                                mlp_ratio=self.mlp_ratios[i],
                                drop_path_rate=float(dpr[blk_idx]),
                                dtype=self.dtype,
                                name=f's{i}_b{j}')(seq, (h, w), train)
                if j == 0:
                    seq = PEG(dim, dtype=self.dtype,
                              name=f'peg{i}')(seq, (h, w))
            x = seq.reshape(b, h, w, dim)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class SVT(PCPVT):
    windows: Sequence[int] = (7, 7, 7, 7)
    depths: Sequence[int] = (2, 2, 10, 4)
    embed_dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
