"""Fully-convolutional domain discriminator (mirror of
``rsiseg/models/discriminators/fc_discriminator.py``)."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..builder import DISCRIMINATORS


@DISCRIMINATORS.register_module()
class FCDiscriminator(nn.Module):
    num_in_channels: int = 19
    ndf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8, 1]
        for i, w in enumerate(widths):
            # stop downsampling once the map is tiny (shapes are static
            # at trace time) — guards small-logit inputs from collapsing
            # to empty tensors; param shapes are unaffected
            small = min(x.shape[1], x.shape[2]) < 4
            x = nn.Conv(w, (4, 4),
                        strides=(1, 1) if small else (2, 2),
                        padding='SAME' if small else ((1, 1), (1, 1)),
                        dtype=self.dtype,
                        name=f'conv{i}')(x)
            if i < len(widths) - 1:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return jnp.mean(x, axis=(1, 2), keepdims=True)
