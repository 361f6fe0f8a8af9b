"""Transformer-decoder heads: SETR (naive/PUP/MLA) and Segmenter.

Mirrors of ``rsiseg/models/decode_heads/{setr_up_head, setr_mla_head,
segmenter_mask_head}.py``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import HEADS
from ..utils.layers import ConvModule
from .base import ClsSeg, transform_inputs


@HEADS.register_module()
class SETRUPHead(nn.Module):
    """Progressive upsampling head (SETR-PUP)."""
    in_channels: int = 768
    channels: int = 256
    num_classes: int = 19
    num_convs: int = 4
    up_scale: int = 2
    kernel_size: int = 3
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = transform_inputs(inputs, self.in_index,
                             self.input_transform, self.align_corners)
        x = nn.LayerNorm(dtype=self.dtype, name='norm')(x)
        for i in range(self.num_convs):
            x = ConvModule(self.channels, self.kernel_size,
                           padding=self.kernel_size // 2,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name=f'up_conv{i}')(x, train=train)
            x = resize(x, scale_factor=self.up_scale, mode='bilinear',
                       align_corners=self.align_corners)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(x, train=train)
        return logits, x


@HEADS.register_module()
class SETRMLAHead(nn.Module):
    """Multi-level aggregation head (SETR-MLA)."""
    in_channels: Sequence[int] = (256,) * 4
    channels: int = 512
    num_classes: int = 19
    mla_channels: int = 128
    up_scale: int = 4
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = (0, 1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        feats = [inputs[i] for i in self.in_index]
        # SETR's MLA levels share one resolution (plain-ViT features);
        # align to the first level's upsampled size so pyramid inputs
        # also work.
        target = (feats[0].shape[1] * self.up_scale,
                  feats[0].shape[2] * self.up_scale)
        ups = []
        for i, f in enumerate(feats):
            y = ConvModule(self.mla_channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name=f'mla_conv{i}')(f, train=train)
            y = resize(y, size=target, mode='bilinear',
                       align_corners=self.align_corners)
            ups.append(y)
        x = jnp.concatenate(ups, axis=-1)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(x, train=train)
        return logits, x


@HEADS.register_module()
class SegmenterMaskTransformerHead(nn.Module):
    """Segmenter mask-transformer head: learned class tokens decoded
    jointly with patch tokens; masks = scaled patch-class dot."""
    in_channels: int = 768
    channels: int = 768
    num_classes: int = 19
    num_layers: int = 2
    num_heads: int = 12
    embed_dims: int = 768
    dropout_ratio: float = 0.0
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = transform_inputs(inputs, self.in_index,
                             self.input_transform, self.align_corners)
        b, h, w, c = x.shape
        d = self.embed_dims
        seq = nn.Dense(d, dtype=self.dtype,
                       name='proj_in')(x.reshape(b, h * w, c))
        cls_tokens = self.param('cls_emb',
                                nn.initializers.truncated_normal(0.02),
                                (1, self.num_classes, d))
        seq = jnp.concatenate(
            [seq, jnp.tile(cls_tokens, (b, 1, 1))], axis=1)
        hd = d // self.num_heads
        for li in range(self.num_layers):
            y = nn.LayerNorm(dtype=self.dtype, name=f'norm1_{li}')(seq)
            qkv = nn.Dense(d * 3, dtype=self.dtype,
                           name=f'qkv_{li}')(y)
            n = qkv.shape[1]
            qkv = qkv.reshape(b, n, 3, self.num_heads, hd).transpose(
                2, 0, 3, 1, 4)
            attn = jax.nn.softmax(
                jnp.einsum('bhqd,bhkd->bhqk', qkv[0], qkv[1],
                           preferred_element_type=jnp.float32) *
                hd**-0.5, axis=-1)
            o = jnp.einsum('bhqk,bhkd->bhqd',
                           attn.astype(qkv[2].dtype), qkv[2],
                           preferred_element_type=jnp.float32)
            o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
            seq = seq + nn.Dense(d, dtype=self.dtype,
                                 name=f'proj_{li}')(
                                     o.astype(self.dtype))
            y = nn.LayerNorm(dtype=self.dtype, name=f'norm2_{li}')(seq)
            y = nn.Dense(d * 4, dtype=self.dtype, name=f'fc1_{li}')(y)
            y = nn.gelu(y, approximate=False)
            seq = seq + nn.Dense(d, dtype=self.dtype,
                                 name=f'fc2_{li}')(y)
        seq = nn.LayerNorm(dtype=self.dtype, name='norm_out')(seq)
        patches, cls = seq[:, :h * w], seq[:, h * w:]
        patches = nn.Dense(d, dtype=self.dtype, name='patch_proj')(
            patches)
        cls = nn.Dense(d, dtype=self.dtype, name='cls_proj')(cls)
        patches = patches / (jnp.linalg.norm(
            patches, axis=-1, keepdims=True) + 1e-6)
        cls = cls / (jnp.linalg.norm(cls, axis=-1, keepdims=True) +
                     1e-6)
        masks = jnp.einsum('bnd,bkd->bnk', patches, cls,
                           preferred_element_type=jnp.float32)
        logits = masks.reshape(b, h, w, self.num_classes).astype(
            self.dtype)
        feats = seq[:, :h * w].reshape(b, h, w, d)
        return logits, feats
