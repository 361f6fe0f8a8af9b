"""Attention-based context heads: DAHead, NLHead, GCHead, ANNHead.

TPU-native mirrors of ``rsiseg/models/decode_heads/{da_head, nl_head,
gc_head, ann_head}.py``: the non-local / position / channel attention
blocks are expressed as plain batched matmuls over flattened spatial
positions (MXU-friendly), replacing mmcv's compiled NonLocal2d.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import HEADS
from ..utils.layers import ConvModule
from .base import ClsSeg, transform_inputs


class PositionAttention(nn.Module):
    """DANet PAM: spatial self-attention with learned gamma."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name='q')(x)
        k = nn.Conv(c // 8, (1, 1), dtype=self.dtype, name='k')(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name='v')(x)
        qf = q.reshape(b, h * w, -1)
        kf = k.reshape(b, h * w, -1)
        vf = v.reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum('bqc,bkc->bqk', qf, kf,
                       preferred_element_type=jnp.float32), axis=-1)
        out = jnp.einsum('bqk,bkc->bqc', attn.astype(vf.dtype), vf,
                         preferred_element_type=jnp.float32)
        gamma = self.param('gamma', nn.initializers.zeros, ())
        return x + gamma * out.reshape(b, h, w, c).astype(x.dtype)


class ChannelAttention(nn.Module):
    """DANet CAM: channel self-attention with learned gamma."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        xf = x.reshape(b, h * w, c)
        energy = jnp.einsum('bnc,bnd->bcd', xf, xf,
                            preferred_element_type=jnp.float32)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy, axis=-1)
        out = jnp.einsum('bcd,bnd->bnc', attn.astype(xf.dtype), xf,
                         preferred_element_type=jnp.float32)
        gamma = self.param('gamma', nn.initializers.zeros, ())
        return x + gamma * out.reshape(b, h, w, c).astype(x.dtype)


@HEADS.register_module()
class DAHead(nn.Module):
    """Dual attention head (``da_head.py``).

    Faithful loss structure (``da_head.py:157-178``): training computes
    THREE separate CE losses — ``pam_cam`` (the summed branch), ``pam``
    and ``cam`` — via per-branch classifiers; inference uses only the
    ``pam_cam`` output (``da_head.py:162-164``).  The segmentor detects
    ``branch_loss_names`` and prefixes the branch losses
    ``decode.pam_cam.* / decode.pam.* / decode.cam.*``."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    pam_channels: int = 64
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

    # training computes separate losses for these extra outputs;
    # the primary (first) output carries the 'pam_cam' prefix
    branch_loss_names = ('pam', 'cam')
    primary_loss_name = 'pam_cam'

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = transform_inputs(inputs, self.in_index,
                             self.input_transform, self.align_corners)
        pam = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='pam_in')(x, train=train)
        pam = PositionAttention(self.channels, dtype=self.dtype,
                                name='pam')(pam)
        pam = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='pam_out')(pam, train=train)
        cam = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='cam_in')(x, train=train)
        cam = ChannelAttention(dtype=self.dtype, name='cam')(cam)
        cam = ConvModule(self.channels, 3, padding=1,
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name='cam_out')(cam, train=train)
        # per-branch classifiers (``da_head.py:101-117`` pam_cls_seg /
        # cam_cls_seg); computed unconditionally so init creates their
        # params, cost = two 1x1 convs to num_classes
        pam_logits = ClsSeg(self.num_classes, self.dropout_ratio,
                            dtype=self.dtype,
                            name='pam_cls')(pam, train=train)
        cam_logits = ClsSeg(self.num_classes, self.dropout_ratio,
                            dtype=self.dtype,
                            name='cam_cls')(cam, train=train)
        feats = pam + cam
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats, pam_logits, cam_logits


@HEADS.register_module()
class NLHead(nn.Module):
    """Non-local head (``nl_head.py``)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'
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
        attn = jnp.einsum('bqc,bkc->bqk', theta, phi,
                          preferred_element_type=jnp.float32)
        if self.use_scale:
            attn = attn / jnp.sqrt(float(inter))
        attn = jax.nn.softmax(attn, axis=-1)
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
class GCHead(nn.Module):
    """Global-context head (``gc_head.py``): GCNet context block."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    ratio: float = 0.25
    pooling_type: str = 'att'
    fusion_types: Sequence[str] = ('channel_add',)
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
        if self.pooling_type == 'att':
            mask = nn.Conv(1, (1, 1), dtype=self.dtype,
                           name='context_mask')(y)
            mask = jax.nn.softmax(mask.reshape(b, h * w, 1), axis=1)
            context = jnp.einsum('bnc,bn1->bc', y.reshape(b, h * w, c),
                                 mask.astype(y.dtype))
            context = context.reshape(b, 1, 1, c)
        else:
            context = jnp.mean(y, axis=(1, 2), keepdims=True)
        hidden = max(int(c * self.ratio), 1)
        t = nn.Conv(hidden, (1, 1), dtype=self.dtype,
                    name='transform1')(context)
        t = nn.LayerNorm(dtype=self.dtype, name='transform_ln')(t)
        t = nn.relu(t)
        t = nn.Conv(c, (1, 1), dtype=self.dtype, name='transform2')(t)
        y = y + t
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='bottleneck')(
                               jnp.concatenate([x, y], axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats
