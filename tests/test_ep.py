"""Expert-parallel MoE (`pfst_tpu/parallel/ep.py`): with ample
capacity the sharded layer equals the dense per-token computation."""
import jax
import jax.numpy as jnp
import numpy as np

from pfst_tpu.parallel import ep


def _expert(params, x):
    return jnp.tanh(x @ params['w']) @ params['v']


def _make(n_experts, d=8, h=16, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_experts)
    params_list = [
        {'w': jax.random.normal(k, (d, h)) * 0.3,
         'v': jax.random.normal(jax.random.fold_in(k, 1),
                                (h, d)) * 0.3} for k in keys
    ]
    gate_w = jax.random.normal(jax.random.PRNGKey(seed + 7),
                               (d, n_experts))
    return params_list, gate_w


def _dense_reference(params_list, gate_w, x):
    probs = jax.nn.softmax(x @ gate_w, axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    gate = jnp.take_along_axis(probs, idx[:, None], axis=1)[:, 0]
    outs = jnp.stack([_expert(p, x) for p in params_list])  # (E,T,D)
    sel = jnp.take_along_axis(
        outs, idx[None, :, None].repeat(1, 0), axis=0)[0]
    return sel * gate[:, None]


def test_moe_matches_dense_with_ample_capacity():
    n_experts = 8
    params_list, gate_w = _make(n_experts)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 8))

    mesh = ep.get_expert_mesh(n_experts)
    from pfst_tpu.parallel import pp
    stacked = pp.stack_stage_params(params_list)
    out = ep.moe_apply(_expert, stacked, x, gate_w, mesh,
                       capacity_factor=float(n_experts) * 2)
    ref = _dense_reference(params_list, gate_w, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_capacity_drops_are_zero_passthrough():
    """Over-capacity tokens contribute zeros (Switch semantics) —
    never garbage from another token."""
    n_experts = 2
    params_list, _ = _make(n_experts, seed=3)
    # route EVERY token to expert 0: gate reads only the constant
    # feature in the last column
    gate_w = jnp.zeros((8, 2)).at[-1, 0].set(10.0).at[-1, 1].set(-10.)
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 8))
    x = x.at[:, -1].set(1.0)
    mesh = ep.get_expert_mesh(n_experts)
    from pfst_tpu.parallel import pp
    stacked = pp.stack_stage_params(params_list)
    out = np.asarray(ep.moe_apply(_expert, stacked, x, gate_w, mesh,
                                  capacity_factor=0.5))
    ref = np.asarray(_dense_reference(params_list, gate_w, x))
    # capacity = 0.5 * 8 / 2 = 2 per device: the first 2 local tokens
    # per shard match dense, the rest are exactly zero
    t_local = 16 // n_experts
    for dev in range(n_experts):
        blk = slice(dev * t_local, dev * t_local + t_local)
        got, want = out[blk], ref[blk]
        np.testing.assert_allclose(got[:2], want[:2], rtol=1e-5,
                                   atol=1e-5)
        assert np.abs(got[2:]).max() == 0.0


def test_moe_is_differentiable():
    n_experts = 4
    params_list, gate_w = _make(n_experts, seed=5)
    x = jax.random.normal(jax.random.PRNGKey(4), (32, 8))
    mesh = ep.get_expert_mesh(n_experts)
    from pfst_tpu.parallel import pp
    stacked = pp.stack_stage_params(params_list)

    def loss(stacked, gate_w):
        out = ep.moe_apply(_expert, stacked, x, gate_w, mesh,
                           capacity_factor=float(n_experts) * 2)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss, argnums=(0, 1))(stacked, gate_w)
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
    # EVERY expert that received tokens must receive gradient
    idx = np.asarray(jnp.argmax(jax.nn.softmax(x @ gate_w, -1), -1))
    used = np.zeros(n_experts, bool)
    used[np.unique(idx)] = True
    gw = np.abs(np.asarray(grads[0]['w'])).reshape(n_experts, -1)
    assert used.any()
    assert (gw.max(1)[used] > 0).all(), (used, gw.max(1))
