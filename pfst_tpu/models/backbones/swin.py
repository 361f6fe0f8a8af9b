"""Swin Transformer backbone (mirror of
``rsiseg/models/backbones/swin.py``).

Windowed multi-head attention with shifted windows and relative
position bias; patch merging between stages.  Window partitioning is a
pure reshape (inputs padded to window multiples), so the whole stage is
static-shape MXU matmuls.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import BACKBONES
from .beit import drop_path


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        bnw, n, c = x.shape
        ws = self.window_size
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       dtype=self.dtype, name='qkv')(x)
        qkv = qkv.reshape(bnw, n, 3, self.num_heads, hd).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                          preferred_element_type=jnp.float32) * hd**-0.5
        table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1)**2, self.num_heads))
        idx = relative_position_index(ws).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads).transpose(
            2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bnw, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        name='proj')(out.astype(self.dtype))


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: bool = False
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def _dp(z):
            # stochastic depth on each residual branch
            if not train or self.drop_path_rate == 0.0:
                return z
            return drop_path(z, self.drop_path_rate, False,
                             self.make_rng('dropout'))
        b, h, w, c = x.shape
        ws = self.window_size
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, name='norm1')(x)
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        shift = ws // 2 if self.shift else 0
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = _attn_mask(hp, wp, ws, shift)
        else:
            mask = None
        windows = window_partition(y, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               qkv_bias=self.qkv_bias,
                               dtype=self.dtype,
                               name='attn')(windows, mask, train=train)
        y = window_reverse(attn, ws, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w, :]
        x = shortcut + _dp(y)
        y = nn.LayerNorm(dtype=self.dtype, name='norm2')(x)
        hdim = self.dim * self.mlp_ratio
        y = nn.Dense(hdim, dtype=self.dtype, name='fc1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name='fc2')(y)
        return x + _dp(y)


def _attn_mask(hp, wp, ws, shift):
    img_mask = np.zeros((1, hp, wp, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mask_windows = window_partition(jnp.asarray(img_mask), ws)[..., 0]
    diff = mask_windows[:, None, :] - mask_windows[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    pretrain_img_size: int = 224
    in_channels: int = 3
    embed_dims: int = 96
    patch_size: int = 4
    window_size: int = 7
    mlp_ratio: int = 4
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    strides: Sequence[int] = (4, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    patch_norm: bool = True
    norm_cfg: Optional[dict] = None
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    dtype=self.dtype, name='patch_embed')(x)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=self.dtype, name='patch_norm')(x)
        # linearly spaced stochastic-depth schedule over ALL blocks
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = []
        for i, depth in enumerate(self.depths):
            dim = self.embed_dims * 2**i
            if i > 0:
                # patch merging: 2x2 neighborhood concat + linear
                b, h, w, c = x.shape
                ph, pw = h % 2, w % 2
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                x = jnp.concatenate([
                    x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                    x[:, 0::2, 1::2], x[:, 1::2, 1::2]
                ], axis=-1)
                x = nn.LayerNorm(dtype=self.dtype,
                                 name=f'merge_norm{i}')(x)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                             name=f'merge_reduce{i}')(x)
            block_cls = (nn.remat(SwinBlock, static_argnums=(2,))
                         if self.with_cp else SwinBlock)
            for j in range(depth):
                blk_idx = sum(self.depths[:i]) + j
                x = block_cls(dim, self.num_heads[i],
                              self.window_size, shift=bool(j % 2),
                              mlp_ratio=self.mlp_ratio,
                              qkv_bias=self.qkv_bias,
                              drop_path_rate=float(dpr[blk_idx]),
                              dtype=self.dtype,
                              name=f'stage{i}_block{j}')(x, train)
            if i in self.out_indices:
                outs.append(
                    nn.LayerNorm(dtype=self.dtype,
                                 name=f'out_norm{i}')(x))
        return tuple(outs)
