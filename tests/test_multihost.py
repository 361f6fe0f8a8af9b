"""REAL multi-process execution of the multi-host path: two
processes x 4 virtual CPU devices form one 8-device world
(`jax.distributed.initialize` + Gloo), run the shard_map DDP train
step with per-process loader shards assembled into global arrays
(`mesh.shard_batch` -> `make_array_from_process_local_data`), and
must agree with the single-process 8-device step bit-for-bit."""
import os
import os.path as osp
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = osp.abspath(osp.join(osp.dirname(__file__), '..'))

_MODEL = """
norm_cfg = dict(type='BN', requires_grad=True)
model_cfg = dict(
    type='EncoderDecoder',
    backbone=dict(type='ResNetV1c', depth=18, num_stages=4,
                  base_channels=8, stem_channels=8,
                  out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                  strides=(1, 2, 1, 1), norm_cfg=norm_cfg,
                  contract_dilation=True),
    decode_head=dict(type='FCNHead', in_channels=64, in_index=3,
                     channels=16, num_convs=1, concat_input=False,
                     dropout_ratio=0.0, num_classes=6,
                     norm_cfg=norm_cfg, align_corners=False,
                     loss_decode=dict(type='CrossEntropyLoss',
                                      use_sigmoid=False,
                                      loss_weight=1.0)),
    train_cfg=dict(), test_cfg=dict(mode='whole'))
"""

_WORKER = """
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + \
    ' --xla_force_host_platform_device_count=4'
import jax
jax.config.update('jax_platforms', 'cpu')
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(f'127.0.0.1:{{port}}', 2, pid)
sys.path.insert(0, {repo!r})
import numpy as np, optax
import jax.numpy as jnp
from pfst_tpu.apis.train import SupervisedTrainer
from pfst_tpu.models import build_segmentor
from pfst_tpu.parallel.mesh import (get_mesh, make_sharded_train_step,
                                    shard_batch)
{model}
assert jax.process_count() == 2 and jax.local_device_count() == 4
assert jax.device_count() == 8
algo = SupervisedTrainer(build_segmentor(model_cfg))
tx = optax.adamw(1e-3)
state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
mesh = get_mesh()  # all 8 GLOBAL devices
step = make_sharded_train_step(algo, tx, [0., 0., 0.], [1., 1., 1.],
                               mesh)
rs = np.random.RandomState(0)
g_img = rs.randn(8, 32, 32, 3).astype(np.float32)
g_gt = rs.randint(0, 6, (8, 32, 32)).astype(np.int32)
local = slice(pid * 4, (pid + 1) * 4)  # this process's loader shard
batch = shard_batch({{'img': jnp.asarray(g_img[local]),
                      'gt_semantic_seg': jnp.asarray(g_gt[local])}},
                    mesh)
state, log_vars, _ = step(state, batch, jax.random.PRNGKey(1))
jax.block_until_ready(state.params)
print(f'MHLOSS {{float(log_vars["loss"]):.10f}}', flush=True)

# multi-process checkpointing: every process calls save COLLECTIVELY
# with the global jax.Array state (orbax writes each process's
# addressable shards, the primary commits), then restores with the
# sharded target and must continue identically to the live state
wd = sys.argv[3]
from pfst_tpu.core.checkpoint import save_checkpoint, load_checkpoint
path = save_checkpoint(wd, 1, state)
restored = load_checkpoint(path, target=state)
_, lv_b, _ = step(restored, batch, jax.random.PRNGKey(2))
_, lv_a, _ = step(state, batch, jax.random.PRNGKey(2))
print(f'MHCONT {{float(lv_a["loss"]):.10f}} '
      f'{{float(lv_b["loss"]):.10f}}', flush=True)
"""


@pytest.mark.slow
def test_two_process_world_matches_single_process(tmp_path):
    worker = tmp_path / 'worker.py'
    worker.write_text(_WORKER.format(repo=REPO, model=_MODEL))
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS',)}
    wd = str(tmp_path / 'mh_ckpt')
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(port),
                          str(i), wd], stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)
    ]
    losses, conts = [], []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, err[-3000:]
        line = [ln for ln in out.splitlines()
                if ln.startswith('MHLOSS')][0]
        losses.append(float(line.split()[1]))
        cline = [ln for ln in out.splitlines()
                 if ln.startswith('MHCONT')][0]
        conts.append(tuple(float(x) for x in cline.split()[1:]))
    assert losses[0] == losses[1], losses
    # collective save -> sharded restore -> identical continuation,
    # agreed on by both processes
    for live, restored in conts:
        assert live == restored, conts
    assert conts[0] == conts[1], conts
    assert osp.isdir(osp.join(wd, 'ckpt', '1'))

    # single-process reference on this test process's own 8-device
    # mesh, same global batch, same seeds
    import jax
    import jax.numpy as jnp
    import optax

    from pfst_tpu.apis.train import SupervisedTrainer
    from pfst_tpu.models import build_segmentor
    from pfst_tpu.parallel.mesh import (get_mesh,
                                        make_sharded_train_step,
                                        shard_batch)
    ns = {}
    exec(_MODEL, ns)
    algo = SupervisedTrainer(build_segmentor(ns['model_cfg']))
    tx = optax.adamw(1e-3)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    mesh = get_mesh()
    step = make_sharded_train_step(algo, tx, [0., 0., 0.],
                                   [1., 1., 1.], mesh)
    rs = np.random.RandomState(0)
    batch = shard_batch(
        {'img': jnp.asarray(rs.randn(8, 32, 32, 3).astype(np.float32)),
         'gt_semantic_seg': jnp.asarray(
             rs.randint(0, 6, (8, 32, 32)).astype(np.int32))}, mesh)
    _, log_vars, _ = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(losses[0], float(log_vars['loss']),
                               rtol=1e-6)
