"""Checkpoint lifecycle: save/load/resume/extract/publish."""
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from conftest import tiny_model_cfg
from pfst_tpu.core.checkpoint import (extract_student, load_checkpoint,
                                      load_meta, save_checkpoint)
from pfst_tpu.models import build_train_model
from pfst_tpu.utils.misc import find_latest_checkpoint


@pytest.fixture(scope='module')
def uda_state():
    cfg = dict(
        uda=dict(type='PFGST', alpha=0.99, pseudo_threshold=0.9,
                 pseudo_weight_ignore_top=0,
                 pseudo_weight_ignore_bottom=0,
                 imnet_feature_dist_lambda=0, mix='class', blur=False,
                 color_jitter_strength=0.2,
                 color_jitter_probability=0.2,
                 print_grad_magnitude=False),
        model=tiny_model_cfg(), runner=dict(max_iters=5))
    algo = build_train_model(cfg)
    tx = optax.adamw(1e-3)
    return algo, algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3),
                                 tx)


def test_save_load_roundtrip(uda_state, tmp_path):
    algo, state = uda_state
    wd = str(tmp_path / 'wd')
    path = save_checkpoint(wd, 7, jax.device_get(state),
                           meta={'CLASSES': ['a', 'b'], 'seed': 0})
    assert find_latest_checkpoint(wd) == path
    restored = load_checkpoint(path, target=state)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, restored.params)
    assert max(jax.tree.leaves(d)) == 0.0
    assert load_meta(wd)['CLASSES'] == ['a', 'b']


def test_relative_path_load(uda_state, tmp_path, monkeypatch):
    """Orbax needs absolute paths; load_checkpoint must normalise
    (regression for the bug found driving tools/test.py)."""
    algo, state = uda_state
    wd = tmp_path / 'wd2'
    save_checkpoint(str(wd), 3, jax.device_get(state))
    monkeypatch.chdir(tmp_path)
    restored = load_checkpoint('wd2/ckpt/3')
    assert 'params' in restored or hasattr(restored, 'params')


def test_extract_student_from_uda_state(uda_state, tmp_path):
    algo, state = uda_state
    wd = str(tmp_path / 'wd3')
    path = save_checkpoint(wd, 1, jax.device_get(state))
    restored = load_checkpoint(path)
    student = extract_student(restored)
    assert 'params' in student and 'batch_stats' in student
    # student variables run inference directly
    model = algo.get_model()
    out, _ = model.apply(student, jnp.zeros((1, 32, 32, 3)),
                         method=model.inference)
    assert out.shape[-1] == 6


def test_async_save_roundtrip(uda_state, tmp_path):
    """async_save commits on a background thread; wait_for_pending (or
    any load_checkpoint) barriers, and the restored tree is identical
    to the device state handed in — including back-to-back saves."""
    from pfst_tpu.core.checkpoint import wait_for_pending
    algo, state = uda_state
    wd = str(tmp_path / 'wd_async')
    save_checkpoint(wd, 1, state, async_save=True)
    path2 = save_checkpoint(wd, 2, state, meta={'seed': 1},
                            async_save=True)
    wait_for_pending()
    assert find_latest_checkpoint(wd) == path2
    restored = load_checkpoint(path2, target=state)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, restored.params)
    assert max(jax.tree.leaves(d)) == 0.0
    assert load_meta(wd)['seed'] == 1


def test_publish_model_cli(uda_state, tmp_path):
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))
    import importlib
    publish = importlib.import_module('publish_model')
    algo, state = uda_state
    wd = str(tmp_path / 'wd4')
    path = save_checkpoint(wd, 2, jax.device_get(state))
    publish.main([path, str(tmp_path / 'pub')])
    pub = load_checkpoint(str(tmp_path / 'pub' / 'ckpt' / '0'))
    assert 'params' in pub
    assert 'ema_params' not in pub  # optimizer/teacher stripped
