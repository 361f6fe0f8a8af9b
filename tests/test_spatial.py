"""Spatially-partitioned whole-scene inference
(`pfst_tpu/parallel/spatial.py`): H-sharded forward must match the
single-device whole-mode forward exactly (layout-only sharding)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from conftest import tiny_model_cfg
from pfst_tpu.models import build_segmentor
from pfst_tpu.parallel import spatial


def _model_and_vars(size=64):
    model = build_segmentor(tiny_model_cfg())
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(
        lambda r, im: model.init({'params': r}, im,
                                 train=False))(rng, small)
    return model, variables


def test_spatial_matches_single_device():
    model, variables = _model_and_vars()
    scene = jnp.asarray(
        np.random.RandomState(0).randn(128, 64, 3), jnp.float32)

    ref, _ = jax.jit(lambda v, im: model.apply(
        v, im, method=model.inference))(variables, scene[None])
    out = spatial.spatial_inference(model, variables, scene)
    assert out.shape == ref[0].shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)


def test_spatial_is_actually_sharded():
    model, variables = _model_and_vars()
    scene = jnp.asarray(
        np.random.RandomState(1).randn(2, 128, 64, 3), jnp.float32)
    cache = {}
    out = spatial.spatial_inference(model, variables, scene,
                                    jit_cache=cache)
    assert out.shape[:3] == (2, 128, 64)
    assert out.sharding.spec == P(None, 'data')
    shard_heights = {s.data.shape[1] for s in out.addressable_shards}
    assert shard_heights == {128 // 8}
    # cache reuse: same shape -> same compiled fn object
    assert len(cache) == 1
    out2 = spatial.spatial_inference(model, variables, scene,
                                     jit_cache=cache)
    assert len(cache) == 1
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_spatial_rejects_indivisible_height():
    model, variables = _model_and_vars()
    scene = jnp.zeros((100, 64, 3), jnp.float32)
    try:
        spatial.spatial_inference(model, variables, scene)
        raise AssertionError('expected divisibility assert')
    except AssertionError as e:
        assert 'not divisible' in str(e)
