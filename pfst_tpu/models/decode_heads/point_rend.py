"""PointRend + STDC + DPT + KNet heads (mirrors of
``rsiseg/models/decode_heads/{point_head, stdc_head, dpt_head,
knet_head}.py``).

PointRend here keeps the dense-logits head interface of this
framework: a coarse prediction is refined at the top-N most uncertain
positions by the shared point MLP (fine + coarse features) and
scattered back — the same architecture expressed with static-shape
top-k instead of host-side random point sampling.
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
from .fcn_head import FCNHead


@HEADS.register_module()
class PointRendHead(nn.Module):
    in_channels: Sequence[int] = (256,)
    channels: int = 256
    num_classes: int = 19
    num_fcs: int = 3
    num_points: int = 2048
    coarse_pred_each_layer: bool = True
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = (0,)
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
        fine = [inputs[i] for i in self.in_index][0]
        b, h, w, cf = fine.shape
        # coarse prediction from the fine features
        coarse = ConvModule(self.channels, 3, padding=1,
                            norm_cfg=self.norm_cfg, dtype=self.dtype,
                            name='coarse_conv')(fine, train=train)
        coarse_logits = ClsSeg(self.num_classes, self.dropout_ratio,
                               dtype=self.dtype,
                               name='coarse_cls')(coarse, train=train)
        # uncertainty = -|top1 - top2|
        top2 = jax.lax.top_k(coarse_logits, 2)[0]
        uncertainty = -(top2[..., 0] - top2[..., 1])    # (B,H,W)
        n_pts = min(self.num_points, h * w)
        flat_u = uncertainty.reshape(b, h * w)
        _, idx = jax.lax.top_k(flat_u, n_pts)           # (B,N)

        def gather_pts(feat):
            return jnp.take_along_axis(
                feat.reshape(b, h * w, feat.shape[-1]), idx[..., None],
                axis=1)

        pt_feats = jnp.concatenate(
            [gather_pts(fine), gather_pts(coarse_logits)], axis=-1)
        y = pt_feats
        for i in range(self.num_fcs):
            y = nn.Dense(self.channels, dtype=self.dtype,
                         name=f'fc{i}')(y)
            y = nn.relu(y)
            if self.coarse_pred_each_layer:
                y = jnp.concatenate([y, gather_pts(coarse_logits)],
                                    axis=-1)
        pt_logits = nn.Dense(self.num_classes, dtype=self.dtype,
                             name='point_cls')(y)     # (B,N,C)
        refined = coarse_logits.reshape(b, h * w, self.num_classes)
        refined = jax.vmap(
            lambda r, i, p: r.at[i].set(p))(refined, idx, pt_logits)
        logits = refined.reshape(b, h, w, self.num_classes)
        return logits, coarse


@HEADS.register_module()
class STDCHead(FCNHead):
    """STDC detail-guidance head (``stdc_head.py``): an FCN head whose
    loss target is the boundary map; the boundary extraction (laplacian
    of the gt) is applied by the config's loss (BCE+Dice)."""


@HEADS.register_module()
class DPTHead(nn.Module):
    """DPT head (``dpt_head.py``): reassemble ViT tokens into a pyramid
    and fuse residually."""
    in_channels: Sequence[int] = (768,) * 4
    channels: int = 256
    num_classes: int = 19
    embed_dims: int = 768
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    readout_type: str = 'ignore'
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
        scales = (4, 2, 1, 0.5)
        pyramid = []
        for i, (f, s) in enumerate(zip(feats, scales)):
            y = ConvModule(self.post_process_channels[i], 1,
                           act_cfg={'type': 'none'}, dtype=self.dtype,
                           name=f'reassemble{i}')(f, train=train)
            if s != 1:
                y = resize(y, scale_factor=s, mode='bilinear',
                           align_corners=self.align_corners)
            y = ConvModule(self.channels, 3, padding=1,
                           act_cfg={'type': 'none'}, dtype=self.dtype,
                           name=f'project{i}')(y, train=train)
            pyramid.append(y)
        out = pyramid[-1]
        for i in range(len(pyramid) - 2, -1, -1):
            out = resize(out, size=pyramid[i].shape[1:3],
                         mode='bilinear',
                         align_corners=self.align_corners)
            res = ConvModule(self.channels, 3, padding=1,
                             norm_cfg=self.norm_cfg, dtype=self.dtype,
                             name=f'fuse{i}')(pyramid[i] + out,
                                              train=train)
            out = res
        feats_out = ConvModule(self.channels, 3, padding=1,
                               norm_cfg=self.norm_cfg,
                               dtype=self.dtype,
                               name='head_conv')(out, train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats_out,
                                                      train=train)
        return logits, feats_out


@HEADS.register_module()
class IterativeDecodeHead(nn.Module):
    """KNet head (``knet_head.py``): learned kernels iteratively
    updated from their masked feature readout."""
    in_channels: int = 512
    channels: int = 256
    num_classes: int = 19
    num_stages: int = 3
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = 3
    input_transform: Optional[str] = None
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    sampler: Optional[dict] = None
    kernel_generate_head: Optional[dict] = None
    kernel_update_head: Optional[Sequence[dict]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = transform_inputs(inputs, self.in_index,
                             self.input_transform, self.align_corners)
        feats = ConvModule(self.channels, 3, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='feat_conv')(x, train=train)
        b, h, w, c = feats.shape
        kernels = self.param('kernels',
                             nn.initializers.normal(0.01),
                             (self.num_classes, c))
        k = jnp.tile(kernels[None], (b, 1, 1))           # (B,K,C)
        logits = jnp.einsum('bhwc,bkc->bhwk', feats, k,
                            preferred_element_type=jnp.float32)
        for s in range(self.num_stages):
            mask = jax.nn.softmax(logits, axis=-1)
            # group feature readout per kernel
            readout = jnp.einsum('bhwk,bhwc->bkc',
                                 mask.astype(feats.dtype), feats,
                                 preferred_element_type=jnp.float32)
            readout = readout.astype(feats.dtype) / (h * w)
            upd = nn.Dense(c, dtype=self.dtype,
                           name=f'update{s}')(readout)
            gate = nn.sigmoid(
                nn.Dense(c, dtype=self.dtype, name=f'gate{s}')(
                    readout))
            k = k * (1 - gate) + upd * gate
            k = nn.LayerNorm(dtype=self.dtype, name=f'norm{s}')(k)
            logits = jnp.einsum('bhwc,bkc->bhwk', feats, k,
                                preferred_element_type=jnp.float32)
        return logits.astype(self.dtype), feats
