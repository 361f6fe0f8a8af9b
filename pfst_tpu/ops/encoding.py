"""Encoding layer (mirror of ``rsiseg/ops/encoding.py:7``).

Learned codewords with soft-assignment aggregation (EncNet). Pure
batched matmul form.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform(minval, maxval):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval, maxval)
    return init


class Encoding(nn.Module):
    channels: int
    num_codes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, N, C) -> encoded (B, K, C)."""
        k, c = self.num_codes, self.channels
        std = 1.0 / ((k * c)**0.5)
        # torch-convention inits (flax's ``uniform`` is [0, scale), so
        # symmetric/negative ranges need explicit bounds): codewords
        # U[-std, std], smoothing factors U[-1, 0) — strictly negative
        # so softmax(s_k * ||x - d_k||^2) always favors NEAR codes
        codewords = self.param('codewords', _uniform(-std, std), (k, c))
        scale = self.param('scale', _uniform(-1.0, 0.0), (k,))
        expanded = x[:, :, None, :] - codewords[None, None]
        dist = jnp.sum(expanded**2, axis=-1)
        assign = jax.nn.softmax(scale * dist, axis=-1)
        encoded = jnp.einsum('bnk,bnkc->bkc', assign, expanded,
                             preferred_element_type=jnp.float32)
        return encoded.astype(x.dtype)
