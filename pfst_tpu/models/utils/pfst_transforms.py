"""Geometric-augmentation replay (mirror of
``rsiseg/models/utils/pfst_transforms.py:11-51``).

The reference replays the Resize/crop/rot90/flip recorded in img_metas
onto teacher outputs; here the replay consumes per-sample int arrays
(``rotate_k``, ``flip_vertical``, ``flip_horizontal``) so it traces
under jit with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _replay_one(img, rotate_k, flip_v, flip_h):
    # rot90 by a traced k: compose via lax.switch over the 4 cases
    def rot(k):
        return lambda x: jnp.rot90(x, k=k, axes=(0, 1))

    img = jax.lax.switch(jnp.clip(rotate_k, 0, 3),
                         [rot(0), rot(1), rot(2), rot(3)], img)
    img = jax.lax.cond(flip_v > 0, lambda x: jnp.flip(x, axis=0),
                       lambda x: x, img)
    img = jax.lax.cond(flip_h > 0, lambda x: jnp.flip(x, axis=1),
                       lambda x: x, img)
    return img


def transform_by_metas(data: jnp.ndarray, metas: dict) -> jnp.ndarray:
    """Apply recorded rot90/flip per sample. data (B, H, W, C)."""
    b = data.shape[0]
    zeros = jnp.zeros((b,), jnp.int32)
    rotate_k = jnp.asarray(metas.get('rotate_k', zeros), jnp.int32)
    flip_v = jnp.asarray(metas.get('flip_vertical', zeros), jnp.int32)
    flip_h = jnp.asarray(metas.get('flip_horizontal', zeros), jnp.int32)
    return jax.vmap(_replay_one)(data, rotate_k, flip_v, flip_h)
