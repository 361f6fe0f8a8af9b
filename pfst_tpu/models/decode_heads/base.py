"""Decode-head shared machinery.

Functional mirror of ``rsiseg/models/decode_heads/decode_head.py``:
heads are pure flax modules returning ``(seg_logits, decoded_features)``
— loss computation (``losses()``, reference ``decode_head.py:249-283``)
lives in ``pfst_tpu/models/segmentors`` so the whole train step stays a
single jitted function.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize


def transform_inputs(inputs, in_index, input_transform: Optional[str],
                     align_corners: bool):
    """Select/concat multi-level features (``decode_head.py:155-180``)."""
    if input_transform in ('resize_concat', 'multiple_select') and \
            isinstance(in_index, int):
        in_index = [in_index]  # tolerate scalar in_index in configs
    if input_transform == 'resize_concat':
        xs = [inputs[i] for i in in_index]
        ups = [
            resize(x, size=xs[0].shape[1:3], mode='bilinear',
                   align_corners=align_corners) for x in xs
        ]
        return jnp.concatenate(ups, axis=-1)
    if input_transform == 'multiple_select':
        return [inputs[i] for i in in_index]
    return inputs[in_index]


class ClsSeg(nn.Module):
    """dropout + 1x1 conv classifier (``decode_head.py:242-247``)."""
    num_classes: int
    dropout_ratio: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dropout_ratio > 0:
            # dropout is active only when a 'dropout' rng is supplied:
            # the EMA teacher runs train-mode BN with frozen dropout
            # (reference ``pfgst.py:247-251`` freezes _DropoutNd only)
            # simply by not passing the rng.
            deterministic = (not train) or (not self.has_rng('dropout'))
            x = nn.Dropout(rate=self.dropout_ratio,
                           deterministic=deterministic)(x)
        return nn.Conv(
            self.num_classes, (1, 1),
            kernel_init=nn.initializers.normal(stddev=0.01),
            dtype=self.dtype, name='conv_seg')(x)


# Fields every head carries; kept as a plain dict the segmentor reads.
HEAD_COMMON_DOC = """
Common head kwargs (mirroring BaseDecodeHead):
    in_channels, channels, num_classes, dropout_ratio, in_index,
    input_transform, align_corners, norm_cfg, act_cfg, ignore_index,
    loss_decode (cfg consumed by the segmentor), sampler (cfg).
"""
