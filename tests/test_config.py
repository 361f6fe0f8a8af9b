"""Config-corpus sweep: every shipped config builds its model
(the reference's de-facto regression net, ``tests/test_config.py``)."""
import glob
import os.path as osp

import pytest

from pfst_tpu.utils import Config

REPO = osp.abspath(osp.join(osp.dirname(__file__), '..'))
LEAF_CONFIGS = sorted(glob.glob(osp.join(REPO, 'configs', 'pfst', '*.py')))


@pytest.mark.parametrize('path', LEAF_CONFIGS,
                         ids=[osp.basename(p) for p in LEAF_CONFIGS])
def test_config_builds_train_model(path):
    cfg = Config.fromfile(path)
    assert 'model' in cfg and 'runner' in cfg
    from pfst_tpu.apis.train import build_algorithm
    algo = build_algorithm(cfg)
    n = cfg.model['decode_head']['num_classes']
    assert algo.num_classes == n
    if 'uda' in cfg:
        # UDA configs must produce the PFGST orchestrator with a
        # student whose heads agree on num_classes
        assert cfg.model['auxiliary_head']['num_classes'] == n
        assert algo.aux_losses, 'PFGST config must carry aux losses'


@pytest.mark.parametrize('path', LEAF_CONFIGS,
                         ids=[osp.basename(p) for p in LEAF_CONFIGS])
def test_config_merge_and_override(path):
    cfg = Config.fromfile(path)
    if 'qat' in osp.basename(path):
        # the QAT leaf is a deliberate short fine-tune of its base
        assert cfg.optimizer['lr'] == 6e-06
        assert cfg.runner['max_iters'] == 4000
        assert cfg.qat['enabled'] is True
    else:
        assert cfg.optimizer['lr'] == 6e-05
        assert cfg.runner['max_iters'] == 40000
    cfg.merge_from_dict({'optimizer.lr': 1e-4,
                         'model.decode_head.num_classes': 7})
    assert cfg.optimizer['lr'] == 1e-4
    assert cfg.model['decode_head']['num_classes'] == 7


def test_base_inheritance_delete_key(tmp_path):
    base = tmp_path / 'base.py'
    base.write_text("a = dict(x=1, y=2)\nb = 3\n")
    child = tmp_path / 'child.py'
    child.write_text(
        "_base_ = ['./base.py']\na = dict(_delete_=True, z=9)\n")
    cfg = Config.fromfile(str(child))
    assert cfg.a.to_dict() == {'z': 9}
    assert cfg.b == 3


MODEL_CONFIGS = sorted(
    glob.glob(osp.join(REPO, 'configs', '_base_', 'models', '*.py')))


@pytest.mark.parametrize('path', MODEL_CONFIGS,
                         ids=[osp.basename(p) for p in MODEL_CONFIGS])
def test_base_model_configs_build(path):
    """Every _base_ model def constructs its segmentor module (the
    reference's config-corpus regression net, ``tests/test_config.py``)."""
    from pfst_tpu.models import build_segmentor
    cfg = Config.fromfile(path)
    model = build_segmentor(dict(cfg.model))
    dh = cfg.model['decode_head']
    # CascadeEncoderDecoder carries a list of stage heads; the model's
    # num_classes mirrors the LAST stage (mmseg semantics)
    expected = (dh[-1] if isinstance(dh, (list, tuple)) else
                dh)['num_classes']
    assert model.num_classes == expected


def test_cfg_options_list_index_override():
    """Dotted numeric --cfg-options index into pipeline lists instead
    of replacing the list with a {'0': ...} dict (mmcv semantics)."""
    from pfst_tpu.utils.config import Config

    cfg = Config(dict(data=dict(train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='Resize', img_scale=(40, 40)),
    ]))))
    cfg.merge_from_dict({'data.train.pipeline.1.img_scale': (64, 64)})
    pipe = cfg.data['train']['pipeline']
    assert isinstance(pipe, list) and len(pipe) == 2
    assert pipe[0]['type'] == 'LoadImageFromFile'
    assert tuple(pipe[1]['img_scale']) == (64, 64)


SCHEDULES = sorted(
    glob.glob(osp.join(osp.dirname(__file__), '..', 'configs', '_base_',
                       'schedules', '*.py')))


@pytest.mark.parametrize('path', SCHEDULES,
                         ids=[osp.basename(p) for p in SCHEDULES])
def test_schedule_configs_build_optimizer(path, tmp_path):
    """Every reference ``_base_/schedules/`` file has a same-named
    counterpart that composes into a leaf and builds a working
    optimizer + LR schedule (reference corpus:
    ``/root/reference/configs/_base_/schedules/``)."""
    from pfst_tpu.core.optimizers import build_optimizer
    leaf = tmp_path / 'leaf.py'
    rel = osp.relpath(path, tmp_path)
    leaf.write_text(f"_base_ = ['{rel}']\n")
    cfg = Config.fromfile(str(leaf))
    if 'optimizer' not in cfg:
        # pure LR fragments (poly10warm) compose with an optimizer
        # from another base, like the reference leaf configs do
        cfg['optimizer'] = dict(type='AdamW', lr=6e-5,
                                betas=(0.9, 0.999), weight_decay=0.01)
    assert cfg['optimizer']['type'] in ('SGD', 'AdamW')
    max_iters = cfg.get('runner', {}).get('max_iters', 40000)
    tx = build_optimizer(dict(cfg['optimizer']),
                         cfg.get('lr_config'), max_iters=max_iters)
    import jax.numpy as jnp
    import optax  # noqa: F401
    params = {'w': jnp.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update({'w': jnp.ones((3,))}, state, params)
    assert jnp.isfinite(updates['w']).all()


def test_schedule_corpus_complete():
    """All 9 reference schedule files are mirrored by name."""
    ref_names = {'adamw', 'adamw_40k', 'adamw_80k', 'poly10warm',
                 'schedule_20k', 'schedule_40k', 'schedule_80k',
                 'schedule_160k', 'schedule_320k'}
    ours = {osp.splitext(osp.basename(p))[0] for p in SCHEDULES}
    assert ref_names <= ours, ref_names - ours
