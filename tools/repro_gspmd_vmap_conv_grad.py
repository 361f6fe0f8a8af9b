#!/usr/bin/env python
"""Minimal repro: GSPMD mis-reduces conv weight gradients under vmap.

Found by pfst_tpu's spatial-parallel training exactness test
(tests/test_spatial.py) and distilled to ~30 lines: take a vmapped
spatial conv whose operand is sharded on BOTH the batch axis (mesh
axis ``data``, size N) and the H axis (mesh axis ``spatial``), and
the backward produces conv kernel gradients exactly **N x** the true
value — the halo-exchange transpose appears to sum the filter
gradient over the ``data`` axis once per data shard.

Observed on jax 0.9.0, CPU backend (8 forced host devices).
Characterization (this script prints all four):

  kernel 3x3, mesh (data=2, spatial=4)  -> ratio 2.0000
  kernel 1x1, mesh (data=2, spatial=4)  -> ratio 1.0000  (no halo)
  kernel 3x3, mesh (data=4, spatial=2)  -> ratio 4.0000  (= data size)
  kernel 3x3, mesh (data=1, spatial=8)  -> ratio 1.0000

3-axis meshes behave the same (verified separately): (data=1,
spatial=2, spatial_w=4) -> 1.0000; (data=2, spatial=2, spatial_w=2)
-> 2.0000 — the factor is the data-axis size, independent of how
many spatial axes shard the operand.

Forward losses are CORRECT — only the gradient is wrong, so any
loss-level "does the sharded step match?" check passes. pfst_tpu
works around it by running the student passes sequentially instead of
vmapped under spatial sharding (parallel/spatial.py
``make_spatial_train_step``; PFST_SP_MERGE=1 re-enables the vmapped
path to re-test newer toolchains against this script).
"""
import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from flax import linen as nn  # noqa: E402
from jax.sharding import Mesh, NamedSharding  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

rs = np.random.RandomState(0)


def check(tag, kernel, mesh_shape, b=None):
    b = b or mesh_shape[0]
    mesh = Mesh(np.array(jax.devices()).reshape(*mesh_shape),
                ('data', 'spatial'))

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return jnp.mean(nn.Conv(8, kernel, use_bias=False,
                                    name='conv')(x) ** 2)

    net = Net()
    x = jnp.asarray(rs.randn(2, b, 16, 16, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x[0])['params']

    def loss(params, x2):
        return jax.vmap(
            lambda xs: net.apply({'params': params}, xs))(x2).sum()

    g_ref = jax.jit(jax.grad(loss))(params, x)
    x_sh = jax.device_put(
        x, NamedSharding(mesh, P(None, 'data', 'spatial')))
    p_repl = jax.device_put(params, NamedSharding(mesh, P()))
    g_sp = jax.jit(jax.grad(loss),
                   out_shardings=NamedSharding(mesh, P()))(p_repl, x_sh)
    a = np.asarray(g_ref['conv']['kernel']).ravel()
    c = np.asarray(g_sp['conv']['kernel']).ravel()
    ratio = float(np.median(c / (a + 1e-20)))
    print(f'[{tag}] sharded/unsharded grad ratio: {ratio:.4f}'
          + ('   <-- WRONG' if abs(ratio - 1) > 0.01 else ''))
    return ratio


if __name__ == '__main__':
    jax.config.update('jax_platforms', 'cpu')
    r1 = check('3x3 conv, mesh (data=2, spatial=4)', (3, 3), (2, 4))
    check('1x1 conv, mesh (data=2, spatial=4)', (1, 1), (2, 4))
    check('3x3 conv, mesh (data=4, spatial=2)', (3, 3), (4, 2))
    check('3x3 conv, mesh (data=1, spatial=8)', (3, 3), (1, 8))
    print('bug present' if abs(r1 - 2.0) < 0.01 else
          'bug NOT present on this toolchain — consider re-enabling '
          'PFST_SP_MERGE')
