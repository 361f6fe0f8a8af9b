"""Pixel accuracy metric (mirror of ``rsiseg/models/losses/accuracy.py``).

Returns percentage in [0, 100] with the reference's eps guards so an
all-ignored image yields ~100*eps/eps -> finite values.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def accuracy(pred: jnp.ndarray, target: jnp.ndarray, topk: int = 1,
             thresh: Optional[float] = None,
             ignore_index: Optional[int] = None) -> jnp.ndarray:
    """Top-k pixel accuracy. ``pred`` NHWC logits, ``target`` (B,H,W)."""
    assert pred.ndim == target.ndim + 1
    if topk == 1:
        pred_value = jnp.max(pred, axis=-1)
        pred_label = jnp.argmax(pred, axis=-1)
        correct = (pred_label == target)
        if thresh is not None:
            correct = correct & (pred_value > thresh)
    else:
        _, idx = jax.lax.top_k(pred, topk)
        correct = jnp.any(idx == target[..., None], axis=-1)
    if ignore_index is not None:
        valid = (target != ignore_index)
        correct = correct & valid
        total = jnp.sum(valid.astype(jnp.float32)) + _EPS
    else:
        total = float(np.prod(target.shape)) + _EPS
    correct_k = jnp.sum(correct.astype(jnp.float32)) + _EPS
    return correct_k * (100.0 / total)
