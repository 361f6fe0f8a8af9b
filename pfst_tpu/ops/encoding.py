"""Encoding layer (mirror of ``rsiseg/ops/encoding.py:7``).

Learned codewords with soft-assignment aggregation (EncNet). Pure
batched matmul form.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class Encoding(nn.Module):
    channels: int
    num_codes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, N, C) -> encoded (B, K, C)."""
        k, c = self.num_codes, self.channels
        std = 1.0 / ((k * c)**0.5)
        codewords = self.param('codewords',
                               nn.initializers.uniform(scale=2 * std),
                               (k, c))
        scale = self.param('scale', nn.initializers.uniform(scale=0.4),
                           (k,))
        # (B,N,K): -s_k * ||x_n - d_k||^2
        expanded = x[:, :, None, :] - codewords[None, None]
        dist = jnp.sum(expanded**2, axis=-1)
        assign = jax.nn.softmax(-(scale - 0.2) * dist, axis=-1)
        encoded = jnp.einsum('bnk,bnkc->bkc', assign, expanded,
                             preferred_element_type=jnp.float32)
        return encoded.astype(x.dtype)
