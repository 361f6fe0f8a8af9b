"""Context-aggregation heads: OCR, DNL, ANN, APC, DM, EMA.

TPU-native mirrors of ``rsiseg/models/decode_heads/{ocr_head, dnl_head,
ann_head, apc_head, dm_head, ema_head}.py`` — every aggregation is a
batched matmul / softmax over flattened spatial positions.
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
from .psp_head import adaptive_avg_pool


@HEADS.register_module()
class OCRHead(nn.Module):
    """Object-contextual representations (``ocr_head.py``).

    Needs prior logits from a paired FCN head in cascade mode; here the
    prior is produced by an internal soft-region branch so the head is
    self-contained (the cascade wiring is config-level).
    """
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    ocr_channels: int = 256
    scale: int = 1
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
    def __call__(self, inputs, train: bool = False, prev_logits=None):
        x = transform_inputs(inputs, self.in_index,
                             self.input_transform, self.align_corners)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bottleneck')(x, train=train)
        if prev_logits is None:
            prev_logits = nn.Conv(self.num_classes, (1, 1),
                                  dtype=self.dtype,
                                  name='soft_regions')(feats)
        b, h, w, c = feats.shape
        probs = jax.nn.softmax(
            prev_logits.reshape(b, h * w, self.num_classes), axis=1)
        # object region representations: class-weighted feature means
        context = jnp.einsum('bnk,bnc->bkc', probs,
                             feats.reshape(b, h * w, c),
                             preferred_element_type=jnp.float32)
        context = context.astype(feats.dtype)
        # pixel-region relation
        query = nn.Conv(self.ocr_channels, (1, 1), dtype=self.dtype,
                        name='query')(feats).reshape(b, h * w, -1)
        key = nn.Dense(self.ocr_channels, dtype=self.dtype,
                       name='key')(context)
        value = nn.Dense(self.ocr_channels, dtype=self.dtype,
                         name='value')(context)
        sim = jax.nn.softmax(
            jnp.einsum('bnc,bkc->bnk', query, key,
                       preferred_element_type=jnp.float32) *
            self.ocr_channels**-0.5, axis=-1)
        ocr = jnp.einsum('bnk,bkc->bnc', sim.astype(value.dtype), value,
                         preferred_element_type=jnp.float32)
        ocr = ocr.reshape(b, h, w, self.ocr_channels).astype(
            feats.dtype)
        out = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                         dtype=self.dtype, name='fuse')(
                             jnp.concatenate([feats, ocr], axis=-1),
                             train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(out, train=train)
        return logits, out


@HEADS.register_module()
class DNLHead(nn.Module):
    """Disentangled non-local head (``dnl_head.py``)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    reduction: int = 2
    temperature: float = 0.05
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
        b, h, w, c = y.shape
        inter = max(c // self.reduction, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype,
                        name='theta')(y).reshape(b, h * w, inter)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype,
                      name='phi')(y).reshape(b, h * w, inter)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype,
                    name='g')(y).reshape(b, h * w, inter)
        # disentangle: whitened pairwise + unary
        theta = theta - theta.mean(axis=1, keepdims=True)
        phi = phi - phi.mean(axis=1, keepdims=True)
        pair = jax.nn.softmax(
            jnp.einsum('bqc,bkc->bqk', theta, phi,
                       preferred_element_type=jnp.float32) /
            self.temperature, axis=-1)
        unary = jax.nn.softmax(
            nn.Conv(1, (1, 1), dtype=self.dtype, name='unary')(
                y).reshape(b, h * w, 1), axis=1)
        attn = pair + unary.transpose(0, 2, 1)
        out = jnp.einsum('bqk,bkc->bqc', attn.astype(g.dtype), g,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, inter).astype(y.dtype)
        out = ConvModule(c, 1, norm_cfg=self.norm_cfg,
                         act_cfg={'type': 'none'}, dtype=self.dtype,
                         name='conv_out_nl')(out, train=train)
        y = y + out
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bottleneck')(
                               jnp.concatenate([x, y], axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats


@HEADS.register_module()
class ANNHead(nn.Module):
    """Asymmetric non-local head (``ann_head.py``): pyramid-sampled
    keys/values make the attention O(N * S)."""
    in_channels: Sequence[int] = (1024, 2048)
    channels: int = 512
    num_classes: int = 19
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = (2, 3)
    input_transform: Optional[str] = 'multiple_select'
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    def _pyramid_kv(self, x, name_prefix):
        samples = []
        for s in self.key_pool_scales:
            samples.append(
                adaptive_avg_pool(x, s).reshape(x.shape[0], -1,
                                                x.shape[-1]))
        return jnp.concatenate(samples, axis=1)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        low, high = [inputs[i] for i in self.in_index]
        b, h, w, _ = high.shape
        y = ConvModule(self.channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='high_in')(high, train=train)
        inter = self.channels // 2
        q = nn.Conv(inter, (1, 1), dtype=self.dtype,
                    name='q')(y).reshape(b, h * w, inter)
        kv_src = self._pyramid_kv(y, 'kv')
        k = nn.Dense(inter, dtype=self.dtype, name='k')(kv_src)
        v = nn.Dense(inter, dtype=self.dtype, name='v')(kv_src)
        attn = jax.nn.softmax(
            jnp.einsum('bqc,bkc->bqk', q, k,
                       preferred_element_type=jnp.float32) *
            inter**-0.5, axis=-1)
        out = jnp.einsum('bqk,bkc->bqc', attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, inter).astype(y.dtype)
        out = ConvModule(self.channels, 1, norm_cfg=self.norm_cfg,
                         act_cfg={'type': 'none'}, dtype=self.dtype,
                         name='out_proj')(out, train=train)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bottleneck')(y + out, train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats


@HEADS.register_module()
class APCHead(nn.Module):
    """Adaptive pyramid context head (``apc_head.py``): ACM modules
    over pooled grids."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    fusion: bool = True
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
        outs = [x]
        for i, s in enumerate(self.pool_scales):
            pooled = adaptive_avg_pool(x, s)  # (b, s, s, cin)
            pooled = ConvModule(self.channels, 1,
                                norm_cfg=self.norm_cfg,
                                dtype=self.dtype,
                                name=f'pool_proj{i}')(pooled,
                                                      train=train)
            # affinity between each pixel and the s*s region summary
            query = ConvModule(self.channels, 1,
                               norm_cfg=self.norm_cfg,
                               dtype=self.dtype,
                               name=f'query{i}')(x, train=train)
            qf = query.reshape(b, h * w, self.channels)
            kf = pooled.reshape(b, s * s, self.channels)
            aff = jax.nn.softmax(
                jnp.einsum('bqc,bkc->bqk', qf, kf,
                           preferred_element_type=jnp.float32),
                axis=-1)
            out = jnp.einsum('bqk,bkc->bqc', aff.astype(kf.dtype), kf,
                             preferred_element_type=jnp.float32)
            outs.append(out.reshape(b, h, w,
                                    self.channels).astype(x.dtype))
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bottleneck')(
                               jnp.concatenate(outs, axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats


@HEADS.register_module()
class DMHead(APCHead):
    """Dynamic multi-scale head (``dm_head.py``): same pooled-context
    aggregation surface as APC with dynamic filters folded into the
    affinity form."""


@HEADS.register_module()
class EMAHead(nn.Module):
    """Expectation-maximisation attention head (``ema_head.py``)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    ema_channels: int = 512
    num_bases: int = 64
    num_stages: int = 3
    momentum: float = 0.1
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
        y = ConvModule(self.ema_channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='ema_in')(x, train=train)
        b, h, w, c = y.shape
        # EMANet's bases are a NON-learned buffer (mmseg EMAModule
        # registers them as a buffer and moving-averages them with
        # ``momentum`` per train step, EM iterations under no_grad) —
        # kept in 'batch_stats' so the train steps' mutable machinery
        # and the cross-replica pmean apply to them like BN stats.
        bases_var = self.variable(
            'batch_stats', 'bases',
            lambda: jax.random.normal(
                self.make_rng('params'),
                (1, self.num_bases, c)) * (1.0 / c**0.5))
        mu = jnp.tile(bases_var.value, (b, 1, 1)).astype(jnp.float32)
        feat = y.reshape(b, h * w, c).astype(jnp.float32)
        feat_em = jax.lax.stop_gradient(feat)  # EM runs in no_grad
        for _ in range(self.num_stages):
            z = jax.nn.softmax(
                jnp.einsum('bnc,bkc->bnk', feat_em, mu,
                           preferred_element_type=jnp.float32),
                axis=-1)
            z = z / (z.sum(axis=1, keepdims=True) + 1e-6)
            mu = jnp.einsum('bnk,bnc->bkc', z, feat_em,
                            preferred_element_type=jnp.float32)
            mu = mu / (jnp.linalg.norm(mu, axis=-1,
                                       keepdims=True) + 1e-6)
        if train and self.momentum > 0 and not self.is_initializing():
            new = jnp.mean(mu, axis=0, keepdims=True)
            new = new / (jnp.linalg.norm(new, axis=-1,
                                         keepdims=True) + 1e-6)
            bases_var.value = (1.0 - self.momentum) * bases_var.value \
                + self.momentum * new
        z = jax.nn.softmax(
            jnp.einsum('bnc,bkc->bnk', feat, mu,
                       preferred_element_type=jnp.float32), axis=-1)
        recon = jnp.einsum('bnk,bkc->bnc', z, mu,
                           preferred_element_type=jnp.float32)
        recon = recon.reshape(b, h, w, c).astype(y.dtype)
        y = nn.relu(y + ConvModule(
            self.ema_channels, 1, norm_cfg=self.norm_cfg,
            act_cfg={'type': 'none'}, dtype=self.dtype,
            name='ema_out')(recon, train=train))
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bottleneck')(
                               jnp.concatenate([x, y], axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats
