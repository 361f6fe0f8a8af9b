"""GPipe pipeline parallelism (`pfst_tpu/parallel/pp.py`): stage-per-
device scan schedule must equal sequential execution, forward and
backward."""
import jax
import jax.numpy as jnp
import numpy as np

from pfst_tpu.parallel import pp


def _block(params, x):
    """Transformer-ish block: (B, N, C) -> (B, N, C)."""
    h = jnp.tanh(x @ params['w1'] + params['b1'])
    return x + h @ params['w2']


def _make_params(rng, n_stages, c=16, hidden=32):
    keys = jax.random.split(rng, n_stages)
    return [
        {
            'w1': jax.random.normal(k, (c, hidden)) * 0.1,
            'b1': jnp.zeros((hidden,)),
            'w2': jax.random.normal(jax.random.fold_in(k, 1),
                                    (hidden, c)) * 0.1,
        } for k in keys
    ]


def _sequential(params_list, x):
    for p in params_list:
        x = _block(p, x)
    return x


def test_gpipe_matches_sequential_forward():
    n_stages, m = 8, 4
    params_list = _make_params(jax.random.PRNGKey(0), n_stages)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 10, 16))

    mesh = pp.get_pipe_mesh(n_stages)
    stacked = pp.shard_stage_params(
        pp.stack_stage_params(params_list), mesh)
    out = pp.gpipe_apply(_block, stacked, x, mesh, n_microbatches=m)
    ref = _sequential(params_list, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gpipe_backward_matches_sequential():
    n_stages, m = 4, 4
    params_list = _make_params(jax.random.PRNGKey(2), n_stages)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 6, 16))
    mesh = pp.get_pipe_mesh(n_stages)
    stacked = pp.stack_stage_params(params_list)

    def loss_pp(stacked_p, x):
        out = pp.gpipe_apply(_block, stacked_p, x, mesh,
                             n_microbatches=m)
        return jnp.sum(out ** 2)

    def loss_seq(stacked_p, x):
        plist = [jax.tree.map(lambda a: a[i], stacked_p)
                 for i in range(n_stages)]
        return jnp.sum(_sequential(plist, x) ** 2)

    g_pp = jax.grad(loss_pp)(stacked, x)
    g_seq = jax.grad(loss_seq)(stacked, x)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_gpipe_uneven_pipe_vs_microbatches():
    """More microbatches than stages (the throughput regime)."""
    n_stages, m = 2, 8
    params_list = _make_params(jax.random.PRNGKey(4), n_stages)
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 4, 16))
    mesh = pp.get_pipe_mesh(n_stages)
    stacked = pp.shard_stage_params(
        pp.stack_stage_params(params_list), mesh)
    out = pp.gpipe_apply(_block, stacked, x, mesh, n_microbatches=m)
    ref = _sequential(params_list, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_gpipe_real_vit_blocks():
    """Pipeline REAL ViT transformer blocks across 4 devices and match
    the sequential stack — the intended production use (transformer
    families have constant (B, N, C) block signatures)."""
    from pfst_tpu.models.backbones.vit import ViTBlock

    n_stages = 4
    block = ViTBlock(dim=16, num_heads=2, mlp_ratio=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 9, 16))
    params_list = [
        block.init({'params': jax.random.PRNGKey(i)}, x,
                   False)['params'] for i in range(n_stages)
    ]

    def block_fn(p, act):
        return block.apply({'params': p}, act, False)

    ref = x
    for p in params_list:
        ref = block_fn(p, ref)

    mesh = pp.get_pipe_mesh(n_stages)
    stacked = pp.shard_stage_params(
        pp.stack_stage_params(params_list), mesh)
    out = pp.gpipe_apply(block_fn, stacked, x, mesh, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
