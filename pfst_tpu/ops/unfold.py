"""Dilated k x k neighborhood extraction (``nn.Unfold`` equivalent).

The PFGST loss's hot op (``rsiseg/models/losses/pfgst_loss.py:29-31``)
is ``nn.Unfold(kernel_size=k, padding=k//2*d, dilation=d)`` applied to
NCHW maps.  On TPU we express it as ``k*k`` statically-shifted slices of
a zero-padded NHWC tensor — XLA fuses the pad + slices into the
consuming elementwise graph, so the (k^2)x blowup is never materialised
in HBM unless the consumer demands it.

Neighbor ordering matches ``nn.Unfold`` (row-major over the kernel
window), so index ``(k*k)//2`` is the center pixel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def unfold_neighbors(x: jax.Array, kernel_size: int,
                     dilation: int = 1) -> jax.Array:
    """Extract dilated neighborhoods.

    Args:
        x: (B, H, W, C) input.
        kernel_size: window size k (odd).
        dilation: dilation d; padding is fixed to ``k//2*d`` so output
            spatial size equals input spatial size.

    Returns:
        (B, H, W, k*k, C) tensor of neighbor features (zero padded at
        borders), ordered row-major over the window.
    """
    if kernel_size % 2 != 1:
        raise ValueError('kernel_size must be odd')
    b, h, w, c = x.shape
    pad = (kernel_size // 2) * dilation
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    views = []
    for i in range(kernel_size):
        for j in range(kernel_size):
            views.append(
                jax.lax.slice(
                    xp, (0, i * dilation, j * dilation, 0),
                    (b, i * dilation + h, j * dilation + w, c)))
    return jnp.stack(views, axis=3)


def unfold_valid_mask(h: int, w: int, kernel_size: int,
                      dilation: int = 1) -> jax.Array:
    """(H, W, k*k) bool mask: True where the neighbor is inside the map.

    Mirrors the implicit zero-padding of ``nn.Unfold``: padded neighbors
    carry value 0 in the reference; some losses need to know which
    entries are real pixels.
    """
    pad = (kernel_size // 2) * dilation
    ys = jnp.arange(h)[:, None, None]
    xs = jnp.arange(w)[None, :, None]
    offs = jnp.arange(kernel_size) * dilation - pad
    oy = jnp.repeat(offs, kernel_size)[None, None, :]
    ox = jnp.tile(offs, kernel_size)[None, None, :]
    yy = ys + oy
    xx = xs + ox
    return (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
