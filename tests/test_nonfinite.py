"""Non-finite-update protection: ``optimizer_config =
dict(skip_nonfinite=N)`` -> ``optax.apply_if_finite`` outermost in the
built transform (``pfst_tpu/core/optimizers.py``).  A NaN/Inf gradient
(bad batch, bf16 overflow) must leave params AND all optimizer state
untouched; after N consecutive bad iterations the update propagates so
the failure is visible.  Neither mmcv's OptimizerHook nor the
reference has an equivalent."""
import jax
import jax.numpy as jnp
import numpy as np

from pfst_tpu.core.optimizers import build_optimizer

P = {'w': jnp.asarray([1.0, 2.0])}
G = {'w': jnp.asarray([0.5, -0.5])}
BAD = {'w': jnp.asarray([jnp.nan, 1.0])}


def _apply(u, p):
    return jax.tree.map(lambda a, b: a + b, p, u)


def test_nan_grads_leave_params_and_state_untouched():
    tx = build_optimizer(dict(type='SGD', lr=0.1, momentum=0.9),
                         None, 100, skip_nonfinite=3)
    s = tx.init(P)
    u, s = tx.update(G, s, P)        # warm the momentum
    p = _apply(u, P)
    mom_before = jax.tree.leaves(s.inner_state)
    u, s = tx.update(BAD, s, p)
    assert np.all(np.asarray(u['w']) == 0.0)   # zero update emitted
    assert int(s.notfinite_count) == 1
    for a, b in zip(mom_before, jax.tree.leaves(s.inner_state)):
        if hasattr(a, 'shape'):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # recovery: the next finite grad applies normally
    u, s = tx.update(G, s, p)
    assert np.all(np.isfinite(np.asarray(u['w'])))
    assert np.abs(np.asarray(u['w'])).max() > 0
    assert int(s.notfinite_count) == 0


def test_gives_up_after_max_consecutive_errors():
    tx = build_optimizer(dict(type='SGD', lr=0.1), None, 100,
                         skip_nonfinite=2)
    s = tx.init(P)
    for i in range(2):
        u, s = tx.update(BAD, s, P)
        assert np.all(np.asarray(u['w']) == 0.0), i  # still guarding
    # 3rd consecutive exceeds max 2: the update propagates (visible)
    u, s = tx.update(BAD, s, P)
    assert not np.all(np.isfinite(np.asarray(u['w'])))


def test_composes_with_gradient_accumulation():
    """A NaN micro-grad never reaches the MultiSteps accumulator: the
    window just extends by one iteration and the applied update equals
    the clean-grads mean."""
    tx = build_optimizer(dict(type='SGD', lr=0.1), None, 100,
                         cumulative_iters=2, skip_nonfinite=5)
    s = tx.init(P)
    u1, s = tx.update(G, s, P)
    assert np.all(np.asarray(u1['w']) == 0.0)  # accumulating
    u2, s = tx.update(BAD, s, P)
    assert np.all(np.asarray(u2['w']) == 0.0)  # dropped, acc clean
    u3, s = tx.update(G, s, P)                 # completes the window
    np.testing.assert_allclose(np.asarray(u3['w']),
                               -0.1 * np.asarray(G['w']), rtol=1e-6)


def test_finite_path_matches_unwrapped():
    kw = dict(type='AdamW', lr=1e-3, weight_decay=0.01)
    plain = build_optimizer(dict(kw), None, 100)
    guarded = build_optimizer(dict(kw), None, 100, skip_nonfinite=1)
    sp, sg = plain.init(P), guarded.init(P)
    p = P
    for i in range(3):
        g = {'w': jnp.asarray([0.1 * (i + 1), -0.2])}
        up, sp = plain.update(g, sp, p)
        ug, sg = guarded.update(g, sg, p)
        np.testing.assert_allclose(np.asarray(ug['w']),
                                   np.asarray(up['w']), rtol=1e-6,
                                   atol=1e-9)
        p = _apply(up, p)


def test_lr_policies_match_reference_formulas():
    """mmcv LrUpdater family (the reference's lr_config surface):
    exp / inv / CosineAnnealing / linear alongside poly/fixed/step."""
    from pfst_tpu.core.optimizers import build_lr_schedule
    base, T = 0.1, 100

    s = build_lr_schedule(dict(policy='exp', gamma=0.95), base, T)
    np.testing.assert_allclose(float(s(10)), 0.1 * 0.95**10, rtol=1e-5)

    s = build_lr_schedule(dict(policy='inv', gamma=0.1, power=0.75),
                          base, T)
    np.testing.assert_allclose(float(s(20)),
                               0.1 * (1 + 0.1 * 20)**-0.75, rtol=1e-5)

    s = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0.01),
                          base, T)
    np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(T)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(
        float(s(50)), 0.01 + 0.5 * 0.09, rtol=1e-5)  # half-way cosine

    s = build_lr_schedule(dict(policy='CosineAnnealing',
                               min_lr_ratio=0.1), base, T)
    np.testing.assert_allclose(float(s(T)), 0.01, rtol=1e-5)

    s = build_lr_schedule(dict(policy='linear', min_lr=0.0), base, T)
    np.testing.assert_allclose(float(s(25)), 0.075, rtol=1e-5)

    # warmup composes with every policy
    s = build_lr_schedule(dict(policy='CosineAnnealing', min_lr=0.0,
                               warmup='linear', warmup_iters=10,
                               warmup_ratio=0.1), base, T)
    assert float(s(0)) < float(s(5)) < float(s(10))
