"""PSPNet head (``rsiseg/models/decode_heads/psp_head.py``).

Pyramid pooling over fixed scales; on TPU the adaptive pools compile to
static mean-pools because input sizes are static under jit.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize
from ..builder import HEADS
from ..utils.layers import ConvModule
from .base import ClsSeg, transform_inputs


def adaptive_avg_pool(x, out_size: int):
    """NHWC adaptive average pool to (out_size, out_size).

    Matches torch AdaptiveAvgPool2d bin edges:
    start = floor(i*S/O), end = ceil((i+1)*S/O).
    """
    b, h, w, c = x.shape
    if out_size == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    rows = []
    for i in range(out_size):
        h0, h1 = (i * h) // out_size, -(-((i + 1) * h) // out_size)
        cols = []
        for j in range(out_size):
            w0, w1 = (j * w) // out_size, -(-((j + 1) * w) // out_size)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class PPM(nn.Module):
    """Pyramid Pooling Module."""
    pool_scales: Sequence[int]
    channels: int
    align_corners: bool
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, scale in enumerate(self.pool_scales):
            out = adaptive_avg_pool(x, scale)
            out = ConvModule(
                self.channels, 1, norm_cfg=self.norm_cfg,
                act_cfg=self.act_cfg, dtype=self.dtype,
                name=f'pool{i}')(out, train=train)
            out = resize(out, size=x.shape[1:3], mode='bilinear',
                         align_corners=self.align_corners)
            outs.append(out)
        return outs


@HEADS.register_module()
class PSPHead(nn.Module):
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    pool_scales: Sequence[int] = (1, 2, 3, 6)
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
        x = transform_inputs(inputs, self.in_index, self.input_transform,
                             self.align_corners)
        psp_outs = [x]
        psp_outs.extend(
            PPM(self.pool_scales, self.channels, self.align_corners,
                self.norm_cfg, self.act_cfg, dtype=self.dtype,
                name='ppm')(x, train=train))
        feats = ConvModule(
            self.channels, 3, padding=1, norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg, dtype=self.dtype,
            name='bottleneck')(jnp.concatenate(psp_outs, axis=-1),
                               train=train)
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(feats, train=train)
        return logits, feats
