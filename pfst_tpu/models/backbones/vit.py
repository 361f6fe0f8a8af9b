"""Vision Transformer backbone (mirror of
``rsiseg/models/backbones/vit.py``; BEiT/MAE register as variants).

Plain ViT with learned position embeddings (bilinear-resized for
non-pretrain input sizes), per-block output taps for pyramid necks.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import BACKBONES


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(dtype=self.dtype, name='norm1')(x)
        b, n, c = y.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name='qkv')(y)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            jnp.einsum('bhqd,bhkd->bhqk', q, k,
                       preferred_element_type=jnp.float32) * hd**-0.5,
            axis=-1)
        o = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        x = x + nn.Dense(self.dim, dtype=self.dtype,
                         name='proj')(o.astype(self.dtype))
        y = nn.LayerNorm(dtype=self.dtype, name='norm2')(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     name='fc1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name='fc2')(y)
        return x + y


@BACKBONES.register_module()
class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_indices: Sequence[int] = (2, 5, 8, 11)
    with_cls_token: bool = True
    output_cls_token: bool = False
    interpolate_mode: str = 'bilinear'
    drop_rate: float = 0.0
    norm_cfg: Optional[dict] = None
    final_norm: bool = False
    with_cp: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    dtype=self.dtype, name='patch_embed')(x)
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        n_pre = (self.img_size // p)
        pos = self.param('pos_embed',
                         nn.initializers.truncated_normal(0.02),
                         (1, n_pre * n_pre + 1, self.embed_dims))
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        if (h, w) != (n_pre, n_pre):
            grid = grid_pos.reshape(1, n_pre, n_pre, self.embed_dims)
            grid = resize(grid, size=(h, w),
                          mode=self.interpolate_mode,
                          align_corners=False)
            grid_pos = grid.reshape(1, h * w, self.embed_dims)
        if self.with_cls_token:
            cls_tok = self.param('cls_token', nn.initializers.zeros,
                                 (1, 1, self.embed_dims))
            seq = jnp.concatenate(
                [jnp.tile(cls_tok, (b, 1, 1)), seq], axis=1)
            seq = seq + jnp.concatenate([cls_pos, grid_pos], axis=1)
        else:
            seq = seq + grid_pos
        outs = []
        # with_cp: rematerialize each block on backward (reference
        # ``vit.py`` with_cp / torch.utils.checkpoint)
        block_cls = (nn.remat(ViTBlock, static_argnums=(2,))
                     if self.with_cp else ViTBlock)
        for i in range(self.num_layers):
            seq = block_cls(self.embed_dims, self.num_heads,
                            self.mlp_ratio, dtype=self.dtype,
                            name=f'block{i}')(seq, train)
            if i in self.out_indices:
                y = seq[:, 1:] if self.with_cls_token else seq
                outs.append(y.reshape(b, h, w, self.embed_dims))
        if self.final_norm and outs:
            outs[-1] = nn.LayerNorm(dtype=self.dtype,
                                    name='final_norm')(outs[-1])
        return tuple(outs)


# BEiT / MAE are faithful implementations in ``beit.py`` (relative
# position bias, layer scale, q/v bias) — no longer ViT aliases.
