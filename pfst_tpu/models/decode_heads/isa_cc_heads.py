"""ISA, CC and PSA heads (mirrors of
``rsiseg/models/decode_heads/{isa_head, cc_head, psa_head}.py``).

* ISA: interlaced sparse self-attention — long-range attention over a
  grid-factorised sequence (two small attentions instead of one big).
* CC: criss-cross attention — row+column attention, twice.  The
  reference uses a compiled CUDA op; rows/columns here are two batched
  matmuls.
* PSA: point-wise spatial attention (collect + distribute masks).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS
from ..utils.layers import ConvModule
from .base import ClsSeg, transform_inputs


class _SelfAttention(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, N, C) full self-attention."""
        q = nn.Dense(self.dim // 2, dtype=self.dtype, name='q')(x)
        k = nn.Dense(self.dim // 2, dtype=self.dtype, name='k')(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name='v')(x)
        attn = jax.nn.softmax(
            jnp.einsum('bqc,bkc->bqk', q, k,
                       preferred_element_type=jnp.float32) *
            (self.dim // 2)**-0.5, axis=-1)
        out = jnp.einsum('bqk,bkc->bqc', attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return out.astype(x.dtype)


@HEADS.register_module()
class ISAHead(nn.Module):
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    isa_channels: int = 256
    down_factor: Sequence[int] = (8, 8)
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = 3
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
        y = ConvModule(self.isa_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='conv_in')(x, train=train)
        b, h, w, c = y.shape
        ph, pw = self.down_factor
        ph, pw = min(ph, h), min(pw, w)
        qh, qw = -(-h // ph), -(-w // pw)
        pad_h, pad_w = qh * ph - h, qw * pw - w
        z = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        # long-range: attend across blocks at the same intra-offset
        z = z.reshape(b, qh, ph, qw, pw, c)
        lr = z.transpose(0, 2, 4, 1, 3, 5).reshape(
            b * ph * pw, qh * qw, c)
        lr = lr + _SelfAttention(c, dtype=self.dtype, name='global')(lr)
        # short-range: attend within each block
        sr = lr.reshape(b, ph, pw, qh, qw, c).transpose(
            0, 3, 4, 1, 2, 5).reshape(b * qh * qw, ph * pw, c)
        sr = sr + _SelfAttention(c, dtype=self.dtype, name='local')(sr)
        z = sr.reshape(b, qh, qw, ph, pw, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, qh * ph, qw * pw, c)
        z = z[:, :h, :w]
        feats = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                           dtype=self.dtype, name='bottleneck')(
                               jnp.concatenate([x, z], axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats


def _criss_cross(q, k, v):
    """row+column attention. q,k (B,H,W,Ck), v (B,H,W,C)."""
    b, h, w, ck = q.shape
    # row attention (over W) and column attention (over H), joint softmax
    row = jnp.einsum('bhqc,bhkc->bhqk', q, k,
                     preferred_element_type=jnp.float32)
    col = jnp.einsum('bqwc,bkwc->bwqk', q.transpose(0, 1, 2, 3),
                     k, preferred_element_type=jnp.float32)
    # col: for each (h,w) attend over H at same w -> shape (B,W,H,H)
    col_t = col.transpose(0, 2, 1, 3)  # (B,Hq,W,Hk)
    # the center pixel appears in BOTH the row and column slices;
    # CCNet masks the column occurrence with -INF so the joint
    # softmax counts it exactly once (the INF trick in CrissCross)
    center = jnp.eye(h, dtype=bool)[None, :, None, :]
    col_t = jnp.where(center, jnp.finfo(jnp.float32).min, col_t)
    energy = jnp.concatenate([row, col_t], axis=-1)  # (B,H,W,W+H)
    attn = jax.nn.softmax(energy, axis=-1)
    a_row, a_col = attn[..., :w], attn[..., w:]
    out_row = jnp.einsum('bhqk,bhkc->bhqc', a_row.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    out_col = jnp.einsum('bhwk,bkwc->bhwc', a_col.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    return (out_row + out_col).astype(v.dtype)


@HEADS.register_module()
class CCHead(nn.Module):
    """criss-cross attention head (recurrence=2)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    recurrence: int = 2
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = 3
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
        y = ConvModule(self.channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='conv_in')(x, train=train)
        c = y.shape[-1]
        gamma = self.param('gamma', nn.initializers.zeros, ())
        # ONE CrissCrossAttention applied recurrently with SHARED
        # weights (mmcv CrissCrossAttention + the `for _ in
        # range(recurrence)` loop) — per-step weights would double the
        # parameters and break torch-checkpoint key mapping
        q_conv = nn.Conv(c // 8, (1, 1), dtype=self.dtype,
                         name='query_conv')
        k_conv = nn.Conv(c // 8, (1, 1), dtype=self.dtype,
                         name='key_conv')
        v_conv = nn.Conv(c, (1, 1), dtype=self.dtype,
                         name='value_conv')
        for _ in range(self.recurrence):
            y = y + gamma * _criss_cross(q_conv(y), k_conv(y),
                                         v_conv(y))
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bottleneck')(
                               jnp.concatenate([x, y], axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats


@HEADS.register_module()
class PSAHead(nn.Module):
    """point-wise spatial attention (collect+distribute)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    mask_size: Sequence[int] = (97, 97)
    psa_type: str = 'bi-direction'
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = 3
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
        b, h, w, cin = x.shape
        red = self.channels // 2
        outs = []
        kinds = ['collect', 'distribute'] if self.psa_type == \
            'bi-direction' else [self.psa_type]
        for kind in kinds:
            y = ConvModule(red, 1, norm_cfg=self.norm_cfg,
                           dtype=self.dtype,
                           name=f'{kind}_reduce')(x, train=train)
            mask = nn.Conv(h * w, (1, 1), dtype=self.dtype,
                           name=f'{kind}_attn')(y)
            attn = jax.nn.softmax(
                mask.reshape(b, h * w, h * w).astype(jnp.float32),
                axis=-1 if kind == 'collect' else 1)
            yf = y.reshape(b, h * w, red)
            if kind == 'collect':
                out = jnp.einsum('bqk,bkc->bqc',
                                 attn.astype(yf.dtype), yf,
                                 preferred_element_type=jnp.float32)
            else:
                out = jnp.einsum('bkq,bkc->bqc',
                                 attn.astype(yf.dtype), yf,
                                 preferred_element_type=jnp.float32)
            outs.append(out.reshape(b, h, w, red).astype(x.dtype))
        y = jnp.concatenate(outs, axis=-1)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bottleneck')(
                               jnp.concatenate([x, y], axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats
