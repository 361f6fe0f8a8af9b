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
            out_ref[:, :, idx] = sim
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
        out_shape=jax.ShapeDtypeStruct((h, w, kernel_size**2),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY
                               if xp.nbytes // b > _VMEM_BUDGET
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.vmap(fn)(xp)


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

    Default comes from ``PFST_USE_PALLAS`` (0/1, default 0): some
    remote-compile services stall on Mosaic kernels embedded in large
    programs, and XLA's fusion of the shifted-slice formulation is
    already good — the kernel is the opt-in fast path.
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
