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
    """Point-wise spatial attention (``psa_head.py``), faithful.

    Implements the full reference surface: ``psa_type``
    collect/distribute/bi-direction, over-complete ``mask_size``
    windows expanded by a static-gather PSAMask
    (``pfst_tpu/ops/psa_mask.py``, replacing mmcv's CUDA op),
    ``compact`` direct-position masks, ``shrink_factor`` downsampling
    with the reference's odd-size align_corners switch
    (``psa_head.py:122-133``), ``psa_softmax`` over the source-position
    axis and ``normalization_factor`` scaling (``psa_head.py:142-147``),
    the k=1/padding=1 ``proj`` quirk and identity-concat bottleneck
    (``psa_head.py:99-113,189-196``).
    """
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    mask_size: Sequence[int] = (97, 97)
    psa_type: str = 'bi-direction'
    compact: bool = False
    shrink_factor: int = 2
    normalization_factor: float = 1.0
    psa_softmax: bool = True
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

    def _shrink(self, y):
        """``psa_head.py:122-137``: downsample by shrink_factor; odd
        sizes round up and flip align_corners."""
        from ...ops import resize as _resize
        h, w = y.shape[1:3]
        sf = self.shrink_factor
        if sf == 1:
            return y, self.align_corners
        if h % sf and w % sf:
            h2, w2 = (h - 1) // sf + 1, (w - 1) // sf + 1
            ac = True
        else:
            h2, w2 = h // sf, w // sf
            ac = False
        return _resize(y, size=(h2, w2), mode='bilinear',
                       align_corners=ac), ac

    def _attention(self, y, train, name):
        """reduce-path attention stack (``psa_head.py:66-75``):
        ConvModule(channels->channels, 1) then a bias-free 1x1 conv to
        mask_h*mask_w channels."""
        mask_h, mask_w = self.mask_size
        a = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                       dtype=self.dtype,
                       name=f'{name}_conv')(y, train=train)
        return nn.Conv(mask_h * mask_w, (1, 1), use_bias=False,
                       dtype=self.dtype, name=f'{name}_mask')(a)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from ...ops import resize as _resize
        from ...ops.psa_mask import psa_mask

        x = transform_inputs(inputs, self.in_index,
                             self.input_transform, self.align_corners)
        identity = x
        norm = 1.0 / self.normalization_factor

        def to_attn(raw, kind):
            """raw over-complete/compact mask (B,h,w,C) -> (B, hw, hw)
            laid out [k, q] for out[q] = sum_k attn[k,q] x[k]."""
            b, h, w, _ = raw.shape
            if self.compact:
                # compact masks address absolute positions directly.
                # Reference transpose semantics differ between modes
                # (``psa_head.py:138-141`` single transposes 'collect'
                # only; ``:173-176`` bi-direction transposes y_dis
                # only) — in this [k, q] layout that means:
                #   single-collect / bi-distribute -> position-major
                #   single-distribute / bi-collect -> channel-major
                raw_r = raw.reshape(b, h * w, h * w)  # [pos, ch]
                channel_major = (
                    (self.psa_type == 'bi-direction' and
                     kind == 'collect') or
                    self.psa_type == 'distribute')
                if channel_major:
                    return jnp.swapaxes(raw_r, 1, 2)  # [k=ch, q=pos]
                return raw_r                          # [k=pos, q=ch]
            return psa_mask(raw, tuple(self.mask_size), kind)

        def bmm(yf, attn):
            """(B,hw,c) x (B,hw[k],hw[q]) -> (B,hw,c), softmax over k
            (reference dim=1) then 1/normalization_factor."""
            if self.psa_softmax:
                attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1)
            out = jnp.einsum('bkc,bkq->bqc', yf,
                             attn.astype(yf.dtype),
                             preferred_element_type=jnp.float32)
            return out.astype(yf.dtype) * norm

        if self.psa_type in ('collect', 'distribute'):
            y = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                           dtype=self.dtype,
                           name='reduce')(x, train=train)
            y, ac = self._shrink(y)
            b, h, w, c = y.shape
            raw = self._attention(y, train, 'attention')
            attn = to_attn(raw, 'collect' if self.psa_type ==
                           'collect' else 'distribute')
            out = bmm(y.reshape(b, h * w, c), attn).reshape(b, h, w, c)
        else:  # bi-direction (``psa_head.py:148-188``)
            y_col = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                               dtype=self.dtype,
                               name='reduce')(x, train=train)
            y_dis = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                               dtype=self.dtype,
                               name='reduce_p')(x, train=train)
            y_col, ac = self._shrink(y_col)
            y_dis, _ = self._shrink(y_dis)
            b, h, w, c = y_col.shape
            raw_col = self._attention(y_col, train, 'attention')
            raw_dis = self._attention(y_dis, train, 'attention_p')
            a_col = to_attn(raw_col, 'collect')
            a_dis = to_attn(raw_dis, 'distribute')
            o_col = bmm(y_col.reshape(b, h * w, c),
                        a_col).reshape(b, h, w, c)
            o_dis = bmm(y_dis.reshape(b, h * w, c),
                        a_dis).reshape(b, h, w, c)
            out = jnp.concatenate([o_col, o_dis], axis=-1)

        # proj: 1x1 ConvModule declared with padding=1 — the reference
        # really grows the map by a zero border before resizing back
        # (``psa_head.py:99-107,189-195``); mirrored for fidelity
        out = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = ConvModule(self.in_channels, 1, norm_cfg=self.norm_cfg,
                         dtype=self.dtype, name='proj')(out,
                                                        train=train)
        out = _resize(out, size=identity.shape[1:3], mode='bilinear',
                      align_corners=ac)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bottleneck')(
                               jnp.concatenate([identity, out],
                                               axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats
