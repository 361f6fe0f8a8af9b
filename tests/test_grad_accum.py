"""Gradient accumulation — ``optimizer_config = dict(
cumulative_iters=k)``, the mmcv ``GradientCumulativeOptimizerHook``
surface the reference inherits (mmcv runner hooks; PFST's own configs
leave it at the plain OptimizerHook).  TPU-native implementation is
``optax.MultiSteps`` around the built transform
(``pfst_tpu/core/optimizers.py``): every iteration runs fwd+bwd on its
own micro-batch, the MEAN gradient applies once per k iterations."""
import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_model_cfg
from pfst_tpu.core.optimizers import build_optimizer

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


def _tree_allclose(a, b, **kw):
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_multisteps_applies_mean_grad_every_k():
    """k accumulation steps apply -lr * mean(g_i) once; the in-between
    updates are exact zeros (params frozen)."""
    params = {'w': jnp.asarray([1.0, 1.0, 1.0])}
    tx = build_optimizer(dict(type='SGD', lr=0.1), None, 100,
                         cumulative_iters=2)
    g1 = {'w': jnp.asarray([1.0, 2.0, 3.0])}
    g2 = {'w': jnp.asarray([3.0, 2.0, 1.0])}
    s = tx.init(params)
    u1, s = tx.update(g1, s, params)
    assert np.all(np.asarray(u1['w']) == 0.0)
    u2, s = tx.update(g2, s, params)
    np.testing.assert_allclose(np.asarray(u2['w']),
                               -0.1 * np.asarray([2.0, 2.0, 2.0]),
                               rtol=1e-6)


def test_multisteps_schedule_stays_iter_indexed():
    """Iter-indexed schedules (poly over runner.max_iters counts
    micro-iterations) must not slow down by k: the first update (after
    k=2 micro-iters) uses the LR of micro-iteration 1, not 0."""
    max_iters, base_lr = 4, 1.0
    lr_cfg = dict(policy='poly', power=1.0, min_lr=0.0)
    params = {'w': jnp.zeros((1,))}
    g = {'w': jnp.ones((1,))}
    tx = build_optimizer(dict(type='SGD', lr=base_lr), lr_cfg,
                         max_iters, cumulative_iters=2)
    s = tx.init(params)
    _, s = tx.update(g, s, params)
    u, s = tx.update(g, s, params)
    # poly(step=1): lr = 1.0 * (1 - 1/4) = 0.75
    np.testing.assert_allclose(np.asarray(u['w']), [-0.75], rtol=1e-6)


def test_trainer_accumulated_step_matches_plain_step():
    """Two k=2 micro-iterations on the SAME batch produce exactly the
    parameter step of one k=1 iteration on that batch (mean of two
    identical grads = the grad); the intermediate iteration leaves
    params untouched.  SGD+momentum so a param mismatch cannot hide in
    adaptive-moment rescaling."""
    from pfst_tpu.apis.train import SupervisedTrainer
    from pfst_tpu.models import build_segmentor

    algo = SupervisedTrainer(build_segmentor(tiny_model_cfg()))
    opt = dict(type='SGD', lr=0.05, momentum=0.9)
    tx1 = build_optimizer(dict(opt), None, 100)
    tx2 = build_optimizer(dict(opt), None, 100, cumulative_iters=2)

    rs = np.random.RandomState(0)
    batch = {
        'img': jnp.asarray(rs.randn(2, 32, 32, 3) * 30 + 100,
                           jnp.float32),
        'gt_semantic_seg': jnp.asarray(rs.randint(0, 6, (2, 32, 32)),
                                       jnp.int32),
    }
    rng = jax.random.PRNGKey(3)

    s1 = algo.init_state(jax.random.PRNGKey(7), (1, 32, 32, 3), tx1)
    s2 = algo.init_state(jax.random.PRNGKey(7), (1, 32, 32, 3), tx2)
    p0 = jax.device_get(s2.params)

    step1 = algo.make_train_step(tx1, MEAN, STD, donate=False)
    step2 = algo.make_train_step(tx2, MEAN, STD, donate=False)

    n1, _, _ = step1(s1, batch, rng)
    mid, _, _ = step2(s2, batch, rng)
    _tree_allclose(mid.params, p0)  # accumulation iter: frozen params
    n2, _, _ = step2(mid, batch, rng)
    _tree_allclose(n2.params, n1.params, rtol=1e-6, atol=1e-7)
    # BN running stats still update every micro-iteration
    assert not np.allclose(
        np.asarray(jax.tree.leaves(mid.batch_stats)[0]),
        np.asarray(jax.tree.leaves(s1.batch_stats)[0]))


def test_train_segmentor_consumes_cumulative_iters(tmp_path):
    """The config surface: optimizer_config.cumulative_iters reaches
    build_optimizer and the loop's state carries MultiSteps innards."""
    tx = build_optimizer(dict(type='AdamW', lr=1e-3), None, 10,
                         grad_clip=dict(max_norm=1.0),
                         cumulative_iters=4)
    params = {'w': jnp.ones((2, 2))}
    s = tx.init(params)
    # optax.MultiStepsState: mini_step / gradient_step counters
    assert hasattr(s, 'mini_step') and hasattr(s, 'gradient_step')
    g = {'w': jnp.full((2, 2), 100.0)}  # clipped at step time
    for i in range(4):
        u, s = tx.update(g, s, params)
    assert int(s.gradient_step) == 1
    # global-norm clip of the MEAN grad to 1.0: |update| bounded by lr
    assert np.abs(np.asarray(u['w'])).max() <= 1.1e-3
