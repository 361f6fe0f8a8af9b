"""Guard: the fused UDA train step is host-free (SURVEY §7 hard parts).

The reference crosses host<->device inside its iteration
(``pfgst.py:262`` pulls the pseudo-label map to numpy; per-sample
kornia loops).  The rebuild's perf thesis is that the whole step is
one device program — this test walks the traced jaxpr of the full
PFGST train step and asserts no callback primitive appears anywhere.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import tiny_model_cfg

FORBIDDEN = {'pure_callback', 'io_callback', 'callback',
             'debug_callback', 'python_callback'}


def _walk_primitives(jaxpr, seen):
    for eqn in jaxpr.eqns:
        seen.add(eqn.primitive.name)
        for v in eqn.params.values():
            vals = v if isinstance(v, (list, tuple)) else (v,)
            for item in vals:
                inner = getattr(item, 'jaxpr', None)
                # ClosedJaxpr.jaxpr is a Jaxpr; a Jaxpr itself has eqns
                if inner is not None and hasattr(inner, 'eqns'):
                    _walk_primitives(inner, seen)
                elif hasattr(item, 'eqns'):
                    _walk_primitives(item, seen)
    return seen


def test_uda_train_step_has_no_host_callbacks():
    import optax

    from pfst_tpu.models import build_train_model
    from pfst_tpu.utils.config import Config

    cfg = Config(dict(
        model=tiny_model_cfg(),
        uda=dict(type='PFGST', alpha=0.99, pseudo_threshold=0.9,
                 pseudo_weight_ignore_top=0,
                 pseudo_weight_ignore_bottom=0,
                 imnet_feature_dist_lambda=0, mix='class', blur=True,
                 color_jitter_strength=0.2,
                 color_jitter_probability=0.2,
                 print_grad_magnitude=False, thre_type='all',
                 use_decoded_feats=True),
        runner=dict(max_iters=10)))
    algo = build_train_model(cfg)
    tx = optax.adamw(1e-3)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    step = algo.make_train_step(
        tx, jnp.zeros((3,)), jnp.ones((3,)), jit=False)
    b = 2
    batch = dict(
        img=jnp.zeros((b, 32, 32, 3)),
        gt_semantic_seg=jnp.zeros((b, 32, 32), jnp.int32),
        target_img=jnp.zeros((b, 32, 32, 3)),
        target_img_strong_aug=jnp.zeros((b, 32, 32, 3)),
    )
    jaxpr = jax.make_jaxpr(step)(state, batch, jax.random.PRNGKey(1))
    prims = _walk_primitives(jaxpr.jaxpr, set())
    bad = prims & FORBIDDEN
    assert not bad, f'host callbacks inside the train step: {bad}'
    # sanity: the walk actually saw the real compute
    assert 'conv_general_dilated' in prims
