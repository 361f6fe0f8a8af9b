"""Device-sharded sliding-window scene inference.

SURVEY §5: the reference handles huge satellite scenes with host-side
window loops (``encoder_decoder.py:220-263``).  Here the static window
grid is sharded over the ``data`` mesh — every device runs its slice of
windows through the jitted ``encode_decode`` in parallel, and the
overlap-averaged logits are assembled with one scatter-add.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# (id(model), windows shape, id(mesh)) -> jitted runner. Keyed by
# object identity: a dead model/mesh only strands a cache entry.
_RUN_CACHE: dict = {}


def window_grid(h_img: int, w_img: int, crop: Tuple[int, int],
                stride: Tuple[int, int]):
    """Reference grid semantics (right/bottom aligned windows)."""
    h_crop, w_crop = min(crop[0], h_img), min(crop[1], w_img)
    h_stride, w_stride = stride
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    coords = []
    for hi in range(h_grids):
        for wi in range(w_grids):
            y1 = max(min(hi * h_stride + h_crop, h_img) - h_crop, 0)
            x1 = max(min(wi * w_stride + w_crop, w_img) - w_crop, 0)
            coords.append((y1, x1))
    return np.asarray(coords, np.int32), (h_crop, w_crop)


def sharded_slide_inference(model, variables, scene: jnp.ndarray,
                            crop: Tuple[int, int],
                            stride: Tuple[int, int],
                            mesh: Mesh = None):
    """scene (H, W, C) -> overlap-averaged logits (H, W, num_classes).

    Windows are padded to a multiple of the device count and processed
    data-parallel; accumulation happens on host in float32 (the
    per-scene histogramming cost is negligible next to the forwards).
    """
    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), (DATA_AXIS,))
    n_dev = mesh.devices.size
    h_img, w_img, c = scene.shape
    coords, (h_crop, w_crop) = window_grid(h_img, w_img, crop, stride)
    n_win = len(coords)
    pad = (-n_win) % n_dev
    coords_padded = np.concatenate(
        [coords, np.repeat(coords[-1:], pad, axis=0)], axis=0)

    # gather all windows (host-side slicing keeps HBM small)
    scene_np = np.asarray(scene)
    windows = np.stack([
        scene_np[y1:y1 + h_crop, x1:x1 + w_crop]
        for y1, x1 in coords_padded
    ])

    # jit once per (model, window shape, mesh): a per-call @jax.jit
    # would recompile the full forward for every scene
    key = (id(model), windows.shape, id(mesh))
    run = _RUN_CACHE.get(key)
    if run is None:
        def _run(variables, wins):
            def one_dev(wins_local):
                def body(win):
                    logits, _ = model.apply(variables, win[None],
                                            method=model.encode_decode)
                    return logits[0]

                return jax.lax.map(body, wins_local)

            from .mesh import _shard_map
            return _shard_map(one_dev, mesh=mesh,
                              in_specs=P(DATA_AXIS),
                              out_specs=P(DATA_AXIS))(wins)

        run = jax.jit(_run)
        _RUN_CACHE[key] = run

    wins_dev = jax.device_put(
        jnp.asarray(windows), NamedSharding(mesh, P(DATA_AXIS)))
    logits = np.asarray(run(variables, wins_dev), np.float32)

    num_classes = logits.shape[-1]
    preds = np.zeros((h_img, w_img, num_classes), np.float32)
    count = np.zeros((h_img, w_img, 1), np.float32)
    for (y1, x1), lg in zip(coords, logits[:n_win]):
        preds[y1:y1 + h_crop, x1:x1 + w_crop] += lg
        count[y1:y1 + h_crop, x1:x1 + w_crop] += 1.0
    assert (count > 0).all()
    return preds / count
