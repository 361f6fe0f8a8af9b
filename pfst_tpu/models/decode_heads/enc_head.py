"""EncNet head with context encoding + SE-loss
(mirror of ``rsiseg/models/decode_heads/enc_head.py``)."""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.encoding import Encoding
from ..builder import HEADS
from ..utils.layers import ConvModule
from .base import ClsSeg


@HEADS.register_module()
class EncHead(nn.Module):
    in_channels: Sequence[int] = (512, 1024, 2048)
    channels: int = 512
    num_classes: int = 19
    num_codes: int = 32
    use_se_loss: bool = True
    add_lateral: bool = False
    dropout_ratio: float = 0.1
    in_index: Union[int, Sequence[int]] = (1, 2, 3)
    input_transform: Optional[str] = 'multiple_select'
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    ignore_index: int = 255
    loss_decode: Optional[Union[dict, Sequence[dict]]] = None
    loss_se_decode: Optional[dict] = None
    sampler: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False,
                 with_se: bool = False):
        feats = [inputs[i] for i in self.in_index]
        x = ConvModule(self.channels, 3, padding=1,
                       norm_cfg=self.norm_cfg, dtype=self.dtype,
                       name='bottleneck')(feats[-1], train=train)
        b, h, w, c = x.shape
        enc = Encoding(self.channels, self.num_codes, dtype=self.dtype,
                       name='encoding')(x.reshape(b, h * w, c))
        enc = nn.relu(jnp.mean(enc, axis=1))  # (B, C)
        gamma = nn.Dense(self.channels, dtype=self.dtype,
                         name='fc')(enc)
        gamma = nn.sigmoid(gamma)
        y = x * gamma[:, None, None, :]
        logits = ClsSeg(self.num_classes, self.dropout_ratio,
                        dtype=self.dtype, name='cls')(y, train=train)
        # SE branch: image-level class presence logits; the segmentor's
        # forward_train asks for them via ``with_se=True`` and applies
        # ``loss_se_decode`` (reference ``enc_head.py:126-127,179-186``)
        se_logits = nn.Dense(self.num_classes, dtype=self.dtype,
                             name='se_layer')(enc)
        if with_se:
            return logits, y, se_logits
        return logits, y

    def se_onehot_labels(self, gt):
        """gt (B, H, W) int -> class-presence onehot (B, num_classes)
        float (``enc_head.py:159-177``; 255 falls outside the hist)."""
        classes = jnp.arange(self.num_classes)[None, :]
        present = jnp.any(
            gt[:, :, :, None] == classes[:, None, None, :],
            axis=(1, 2))
        return present.astype(jnp.float32)
