"""Pallas TPU kernel: fused dilated-neighborhood similarity.

The PFGST loss needs, for every pixel, the cosine (or gaussian)
similarity to its k x k dilated neighbors (``pfgst_loss.py:181-201``).
The XLA path (``pfst_tpu/ops/unfold.py``) expresses this as k^2 shifted
slices; this kernel instead keeps ONE padded feature block in VMEM and
accumulates the k^2 dot products / distances in-register, so the
(k^2 x C)-unfolded tensor never exists anywhere — HBM traffic is one
read of the feature map and one write of the (H, W, k^2) similarity.

Grid: one program per batch element. VMEM budget: the padded map
(H+2p)(W+2p)C * 4B; callers fall back to the XLA path when that exceeds
the budget (see ``neighborhood_similarity``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_EPS = 1e-8
_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom of the ~16MB VMEM


def _sim_kernel(xp_ref, out_ref, *, h, w, k, d, sim_type, sigma):
    # output laid out (k^2, h, w): each neighbor writes one contiguous
    # (h, w) plane with w on the 128-lane minor axis.  A (h, w, k^2)
    # output would put k^2 (= 9) on the lane axis — every store then
    # scatters across a 9-wide minor dim and the kernel runs ~9x
    # slower (measured on v5e).
    pad = (k // 2) * d
    center = xp_ref[pad:pad + h, pad:pad + w, :]
    if sim_type == 'cosine':
        c_norm = jnp.sqrt(jnp.sum(center * center, axis=-1))
    idx = 0
    for i in range(k):
        for j in range(k):
            nb = xp_ref[i * d:i * d + h, j * d:j * d + w, :]
            if sim_type == 'cosine':
                dot = jnp.sum(nb * center, axis=-1)
                n_norm = jnp.sqrt(jnp.sum(nb * nb, axis=-1))
                sim = dot / jnp.maximum(n_norm * c_norm, _EPS)
            else:  # gaussian
                diff = nb - center
                sim = jnp.exp(-jnp.sum(diff * diff, axis=-1) /
                              (sigma * sigma))
            out_ref[idx, :, :] = sim
            idx += 1


def pallas_neighborhood_similarity(x: jax.Array, kernel_size: int,
                                   dilation: int,
                                   sim_type: str = 'cosine',
                                   sigma: float = 30.0) -> jax.Array:
    """x (B,H,W,C) -> sim (B,H,W,k^2) via the fused kernel."""
    b, h, w, c = x.shape
    pad = (kernel_size // 2) * dilation
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    kern = functools.partial(_sim_kernel, h=h, w=w, k=kernel_size,
                             d=dilation, sim_type=sim_type, sigma=sigma)
    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((kernel_size**2, h, w),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY
                               if xp.nbytes // b > _VMEM_BUDGET
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    # (B, k^2, H, W) -> (B, H, W, k^2); the transpose fuses into the
    # consumer
    return jnp.transpose(jax.vmap(fn)(xp), (0, 2, 3, 1))


def xla_neighborhood_similarity(x, kernel_size, dilation,
                                sim_type='cosine', sigma=30.0):
    """Reference XLA path (shifted slices; fused by the compiler)."""
    from .unfold import unfold_neighbors
    unf = unfold_neighbors(x, kernel_size, dilation)
    center = x[:, :, :, None, :]
    if sim_type == 'gaussian':
        d2 = jnp.sum((unf - center)**2, axis=-1)
        return jnp.exp(-d2 / sigma**2)
    num = jnp.sum(unf * center, axis=-1)
    na = jnp.sqrt(jnp.sum(unf**2, axis=-1))
    nb = jnp.sqrt(jnp.sum(center**2, axis=-1))
    return num / jnp.maximum(na * nb, _EPS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _pallas_sim_diff(x, kernel_size, dilation, sim_type, sigma):
    return pallas_neighborhood_similarity(x, kernel_size, dilation,
                                          sim_type, sigma)


def _pallas_sim_fwd(x, kernel_size, dilation, sim_type, sigma):
    return _pallas_sim_diff(x, kernel_size, dilation, sim_type,
                            sigma), x


def _pallas_sim_bwd(kernel_size, dilation, sim_type, sigma, x, g):
    # backward through the (compiler-fused) XLA formulation; forward
    # stays on the handwritten kernel
    _, vjp = jax.vjp(
        lambda t: xla_neighborhood_similarity(t, kernel_size, dilation,
                                              sim_type, sigma), x)
    return vjp(g)


_pallas_sim_diff.defvjp(_pallas_sim_fwd, _pallas_sim_bwd)


def neighborhood_similarity(x, kernel_size, dilation,
                            sim_type='cosine', sigma=30.0,
                            use_pallas: bool = None):
    """Dispatch: Pallas on TPU when the padded map fits VMEM, else XLA.

    Default comes from ``PFST_USE_PALLAS`` (0/1, default 0), for two
    measured reasons (v5e, B2 H128 W128 C64 k3 d2, fwd, incl. tunnel
    overhead): (a) some remote-compile services stall on Mosaic
    kernels embedded in large programs; (b) XLA's fusion of the
    shifted-slice formulation (28 ms) beats the handwritten kernel
    (76 ms after fixing the output layout from (h,w,k^2) minor —
    294 ms — to plane-major (k^2,h,w)) at PFGST's shapes.  The kernel
    remains bit-correct (fwd 8e-7, bwd 1e-8 vs XLA) and is kept as the
    opt-in path for shapes where fusion degrades.
    """
    import os
    if use_pallas is None:
        use_pallas = os.environ.get('PFST_USE_PALLAS', '0') == '1'
    b, h, w, c = x.shape
    pad = (kernel_size // 2) * dilation
    vmem_bytes = (h + 2 * pad) * (w + 2 * pad) * c * 4
    if (use_pallas and _PALLAS_OK
            and jax.default_backend() == 'tpu'
            and vmem_bytes <= _VMEM_BUDGET):
        return _pallas_sim_diff(x, kernel_size, dilation, sim_type,
                                sigma)
    return xla_neighborhood_similarity(x, kernel_size, dilation,
                                       sim_type, sigma)
