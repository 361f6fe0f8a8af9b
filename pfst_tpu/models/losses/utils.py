"""Loss reduction helpers (mirror of ``rsiseg/models/losses/utils.py``)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def get_class_weight(class_weight):
    """Load per-class weights (list or .npy path)."""
    if isinstance(class_weight, str):
        if class_weight.endswith('.npy'):
            class_weight = np.load(class_weight)
        else:
            import json
            with open(class_weight) as f:
                class_weight = json.load(f)
    return class_weight


def reduce_loss(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    raise ValueError(f'invalid reduction {reduction}')


def weight_reduce_loss(loss: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       reduction: str = 'mean',
                       avg_factor: Optional[jnp.ndarray] = None):
    """Apply elementwise weight then reduce (``losses/utils.py:48``).

    With ``avg_factor`` and mean reduction the sum is divided by
    ``avg_factor + eps`` exactly as the reference (guards all-ignored
    batches).
    """
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == 'mean':
        return jnp.sum(loss) / (avg_factor + _EPS)
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``x`` over ``mask`` (eps-guarded)."""
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / (jnp.sum(m) + _EPS)


def masked_std(x: jnp.ndarray, mask: jnp.ndarray,
               unbiased: bool = True) -> jnp.ndarray:
    """Std of ``x`` over ``mask`` (torch ``.std()`` is unbiased)."""
    m = mask.astype(x.dtype)
    n = jnp.sum(m)
    mean = jnp.sum(x * m) / (n + _EPS)
    var = jnp.sum(m * (x - mean)**2) / (
        jnp.maximum(n - (1.0 if unbiased else 0.0), 1e-6))
    return jnp.sqrt(var)
