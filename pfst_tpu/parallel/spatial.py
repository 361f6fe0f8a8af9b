"""Spatially-partitioned whole-scene inference.

The sequence-parallel analog for satellite imagery (SURVEY §5 "inputs
too large for one device pass"): instead of tiling a huge scene into
windows (``parallel/slide.py``), shard the scene's HEIGHT axis across
the ``data`` mesh and run ONE ``whole``-mode forward — XLA GSPMD
inserts the conv halo exchanges and the global reductions (image pool,
BN statistics) from the sharding annotation alone, so every device
holds 1/n of each activation. Memory per chip drops ~n-fold, enabling
whole-scene forwards that cannot fit on one device, with collectives
riding ICI.

Exact by construction: sharding is layout-only, so the result matches
the single-device whole-mode forward (asserted in
``tests/test_spatial.py``).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def spatial_sharding(mesh: Mesh):
    """(B, H, W, C) arrays sharded over H."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def spatial_inference(model, variables, scene, mesh: Mesh = None,
                      jit_cache: dict = None):
    """scene (H, W, C) or (B, H, W, C) -> probs, H-sharded over the mesh.

    H must divide by the device count times the model's output stride
    (pad the scene first if not). Pass a dict as ``jit_cache`` to reuse
    the compiled program across calls of the same shape.
    """
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))
    batched = scene.ndim == 4
    if not batched:
        scene = scene[None]
    n_dev = mesh.devices.size
    h = scene.shape[1]
    assert h % n_dev == 0, \
        f'scene height {h} not divisible by {n_dev} devices — pad first'

    key = ('spatial', tuple(scene.shape), id(mesh))
    fn = (jit_cache or {}).get(key)
    if fn is None:
        sh = spatial_sharding(mesh)
        repl = NamedSharding(mesh, P())

        def forward(variables, img):
            probs, _ = model.apply(variables, img,
                                   method=model.inference)
            return probs

        fn = jax.jit(forward,
                     in_shardings=(repl, sh), out_shardings=sh)
        if jit_cache is not None:
            jit_cache[key] = fn

    scene_dev = jax.device_put(scene, spatial_sharding(mesh))
    variables_dev = jax.device_put(variables,
                                   NamedSharding(mesh, P()))
    probs = fn(variables_dev, scene_dev)
    return probs if batched else probs[0]
