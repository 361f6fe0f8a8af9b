"""PSAMask (PSANet) as a static XLA gather.

Replaces mmcv's compiled ``PSAMask`` CUDA op (consumed by the
reference's ``rsiseg/models/decode_heads/psa_head.py:95-97,139-178``).
The op converts an *over-complete* attention map — at every feature
position a (mask_h, mask_w) window of relative-displacement logits —
into a dense (position, position) attention matrix:

* ``collect``:    out[k, q] = mask at position q, displacement k - q
  (position q collects from position k with a weight predicted at q)
* ``distribute``: out[k, q] = mask at position k, displacement q - k
  (position k distributes to position q with a weight predicted at k)

Displacements outside the mask window are zero.  Both directions are
the same static gather with the displacement index table transposed,
so the whole op lowers to one ``take_along_axis`` — no scatter, no
dynamic shapes, MXU-friendly downstream bmm.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _displacement_index(h: int, w: int, mask_h: int, mask_w: int):
    """idx[x, y] = mask-channel for displacement (x - y) between flat
    positions x, y of an (h, w) grid; valid[x, y] marks displacements
    inside the (mask_h, mask_w) window centred at half = (m - 1) // 2
    (mmcv kernel convention)."""
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    pi = yy.reshape(-1)   # row of each flat position
    pj = xx.reshape(-1)   # col
    di = pi[:, None] - pi[None, :] + half_h    # (hw, hw)
    dj = pj[:, None] - pj[None, :] + half_w
    valid = (di >= 0) & (di < mask_h) & (dj >= 0) & (dj < mask_w)
    idx = np.where(valid, di * mask_w + dj, 0)
    return idx.astype(np.int32), valid


def psa_mask(mask, mask_size, psa_type: str):
    """Over-complete mask -> dense attention, NHWC.

    Args:
        mask: (B, H, W, mask_h * mask_w) over-complete logits.
        mask_size: (mask_h, mask_w) static window.
        psa_type: 'collect' | 'distribute'.

    Returns:
        (B, H*W, H*W) attention logits laid out [k, q] so that
        ``out[q] = sum_k attn[k, q] * x[k]`` matches the reference's
        ``torch.bmm(x.view(n,c,hw), y.view(n,hw,hw))``.
    """
    b, h, w, _ = mask.shape
    mask_h, mask_w = mask_size
    idx, valid = _displacement_index(h, w, mask_h, mask_w)
    # D[a, b'] = idx[b', a]: gather[b, p, j] = mask_r[b, p, idx[j, p]]
    d = jnp.asarray(idx.T)
    v = jnp.asarray(valid.T)
    mask_r = mask.reshape(b, h * w, mask_h * mask_w)
    gathered = jnp.take_along_axis(mask_r, d[None, :, :], axis=2)
    gathered = jnp.where(v[None, :, :], gathered, 0.0)
    if psa_type == 'collect':
        # gathered[b, q, k] = mask_r[b, q, idx[k, q]] -> transpose
        return jnp.swapaxes(gathered, 1, 2)
    if psa_type == 'distribute':
        # gathered[b, k, q] = mask_r[b, k, idx[q, k]]
        return gathered
    raise ValueError(psa_type)
