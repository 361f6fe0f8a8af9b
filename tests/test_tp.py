"""Tensor-parallel (GSPMD) training over a 2-D (data, model) mesh —
`pfst_tpu/parallel/tp.py`. Sharding is layout-only: the dp×tp step
must compute the same numbers as the single-device step."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from pfst_tpu.apis.train import SupervisedTrainer
from pfst_tpu.models import build_segmentor
from pfst_tpu.parallel import tp

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


def _vit_cfg(num_classes=6):
    norm_cfg = dict(type='BN', requires_grad=True)
    return dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=32,
                      patch_size=8, embed_dims=32, num_layers=2,
                      num_heads=4, mlp_ratio=4, out_indices=(0, 1),
                      drop_rate=0.0),
        decode_head=dict(type='FCNHead', in_channels=32, in_index=1,
                         channels=16, num_convs=1, concat_input=False,
                         dropout_ratio=0.0, num_classes=num_classes,
                         norm_cfg=norm_cfg, align_corners=False,
                         loss_decode=dict(type='CrossEntropyLoss',
                                          use_sigmoid=False,
                                          loss_weight=1.0)),
        train_cfg=dict(),
        test_cfg=dict(mode='whole'))


def _batch(b=8, size=32):
    rs = np.random.RandomState(0)
    return {
        'img': jnp.asarray(rs.randn(b, size, size, 3), jnp.float32),
        'gt_semantic_seg': jnp.asarray(
            rs.randint(0, 6, (b, size, size)), jnp.int32),
    }


@pytest.fixture(scope='module')
def setup():
    algo = SupervisedTrainer(build_segmentor(_vit_cfg()))
    tx = optax.adamw(1e-3, weight_decay=0.01)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    return algo, tx, state


def test_tree_specs_megatron_rules(setup):
    algo, tx, state = setup
    specs = tp.tree_specs(state)
    bb = specs.params['backbone_mod']
    assert bb['block0']['qkv']['kernel'] == P(None, 'model')
    assert bb['block0']['qkv']['bias'] == P('model')
    assert bb['block0']['proj']['kernel'] == P('model', None)
    assert bb['block0']['fc1']['kernel'] == P(None, 'model')
    assert bb['block0']['fc2']['kernel'] == P('model', None)
    # non-TP leaves replicated
    assert bb['patch_embed']['kernel'] == P()
    head_specs = jax.tree.leaves(
        specs.params['decode_head_mod'],
        is_leaf=lambda x: isinstance(x, P))
    assert all(s == P() for s in head_specs)
    # the same suffix rules hit the optimizer's mu/nu mirrors
    mu_specs = [
        s for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]
        if any('mu' == getattr(k, 'name', getattr(k, 'key', ''))
               for k in path)
    ]
    assert any(s == P(None, 'model') for s in mu_specs)


@pytest.mark.parametrize('n_model', [2, 4])
def test_tp_step_matches_single_device(setup, n_model):
    algo, tx, state = setup
    batch = _batch()
    rng = jax.random.PRNGKey(7)

    ref_step = algo.make_train_step(tx, MEAN, STD, donate=False)
    ref_state, ref_log, _ = ref_step(state, batch, rng)

    mesh = tp.get_2d_mesh(n_model=n_model)
    assert mesh.devices.shape == (8 // n_model, n_model)
    tp_state = tp.shard_state(state, mesh)
    tp_batch = tp.shard_batch_2d(batch, mesh)
    step = tp.make_tp_train_step(algo, tx, MEAN, STD, mesh)
    new_state, log, _ = step(tp_state, tp_batch, rng)

    np.testing.assert_allclose(float(log['loss']),
                               float(ref_log['loss']), rtol=1e-5)
    ref_leaves = jax.tree.leaves(ref_state.params)
    tp_leaves = jax.tree.leaves(new_state.params)
    for r, t in zip(ref_leaves, tp_leaves):
        np.testing.assert_allclose(np.asarray(r), np.asarray(t),
                                   rtol=2e-4, atol=2e-5)


def test_tp_layout_actually_sharded(setup):
    algo, tx, state = setup
    mesh = tp.get_2d_mesh(n_model=4)
    tp_state = tp.shard_state(state, mesh)
    step = tp.make_tp_train_step(algo, tx, MEAN, STD, mesh)
    new_state, _, _ = step(tp_state, tp.shard_batch_2d(_batch(), mesh),
                           jax.random.PRNGKey(7))
    kernel = new_state.params['backbone_mod']['block0']['qkv']['kernel']
    assert kernel.sharding.spec == P(None, 'model')
    # a (32, 96) kernel on tp=4 stores a (32, 24) shard per device
    shard_shapes = {s.data.shape for s in kernel.addressable_shards}
    assert shard_shapes == {(32, 96 // 4)}
    fc2 = new_state.params['backbone_mod']['block0']['fc2']['kernel']
    # jax normalizes trailing None away: P('model',) == row-sharded
    assert fc2.sharding.spec in (P('model'), P('model', None))
    fc2_shards = {s.data.shape for s in fc2.addressable_shards}
    assert fc2_shards == {(128 // 4, 32)}


def test_train_segmentor_end_to_end_tp(tmp_path):
    """Full train loop with cfg.parallel.tp=2 on the (4, 2) mesh."""
    import cv2
    import os

    from pfst_tpu.apis.train import train_segmentor
    from pfst_tpu.utils.config import Config

    root = tmp_path / 'mini'
    rs = np.random.RandomState(0)
    os.makedirs(root / 'img_dir' / 'train')
    os.makedirs(root / 'ann_dir' / 'train')
    for i in range(8):
        cv2.imwrite(str(root / 'img_dir' / 'train' / f'x{i}.png'),
                    rs.randint(0, 255, (32, 32, 3), np.uint8))
        cv2.imwrite(str(root / 'ann_dir' / 'train' / f'x{i}.png'),
                    rs.randint(0, 7, (32, 32)).astype(np.uint8))

    norm = dict(mean=MEAN, std=STD, to_rgb=True)
    cfg = Config(dict(
        model=_vit_cfg(),
        parallel=dict(tp=2),
        data=dict(
            samples_per_gpu=1, workers_per_gpu=1,
            train=dict(
                type='ISPRSDataset', data_root=str(root),
                img_dir='img_dir/train', ann_dir='ann_dir/train',
                gt_seg_map_loader_cfg=dict(reduce_zero_label=True),
                pipeline=[
                    dict(type='LoadImageFromFile'),
                    dict(type='LoadAnnotations',
                         reduce_zero_label=True),
                    dict(type='Normalize', **norm),
                    dict(type='DefaultFormatBundle'),
                    dict(type='Collect',
                         keys=['img', 'gt_semantic_seg']),
                ])),
        optimizer=dict(type='AdamW', lr=1e-3, betas=(0.9, 0.999),
                       weight_decay=0.01),
        optimizer_config=None,
        lr_config=dict(policy='poly', power=1.0, min_lr=0.0),
        runner=dict(type='IterBasedRunner', max_iters=2),
        checkpoint_config=dict(interval=10),
        evaluation=dict(interval=10),
        log_config=dict(interval=1),
    ))
    state = train_segmentor(cfg, work_dir=None, validate=False, seed=0)
    assert int(state.step) == 2
    qkv = state.params['backbone_mod']['block0']['qkv']['kernel']
    assert qkv.sharding.spec == P(None, 'model')
    # global batch = samples_per_gpu * (8 devices / tp 2) = 4
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state.params))


def test_uda_pfgst_step_under_tp_matches_single_device():
    """Full PFGST UDA step (EMA teacher, pseudo-labels, ClassMix, two
    student passes, PFGST losses) with a ViT student under dp×tp —
    numerics must match the single-device step."""
    import optax

    from pfst_tpu.models import build_train_model

    cfg = dict(
        uda=dict(type='PFGST', alpha=0.999, pseudo_threshold=0.98,
                 pseudo_weight_ignore_top=0,
                 pseudo_weight_ignore_bottom=0,
                 imnet_feature_dist_lambda=0, mix='class', blur=False,
                 color_jitter_strength=0.2,
                 color_jitter_probability=0.2,
                 print_grad_magnitude=False, thre_type='all',
                 trg_loss_weight=1.0, use_decoded_feats=False,
                 aux_losses=[]),
        model=_vit_cfg(),
        runner=dict(max_iters=100))
    algo = build_train_model(cfg)
    tx = optax.adamw(6e-5, weight_decay=0.01)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    rs = np.random.RandomState(0)
    b = 4
    batch = {
        'img': jnp.asarray(rs.randn(b, 32, 32, 3), jnp.float32),
        'gt_semantic_seg': jnp.asarray(
            rs.randint(0, 6, (b, 32, 32)), jnp.int32),
        'target_img': jnp.asarray(rs.randn(b, 32, 32, 3), jnp.float32),
        'target_img_strong_aug': jnp.asarray(
            rs.randn(b, 32, 32, 3), jnp.float32),
    }
    rng = jax.random.PRNGKey(1)

    ref_step = algo.make_train_step(tx, MEAN, STD, donate=False,
                                    axis_name=None, jit=False)
    _, ref_log, _ = jax.jit(ref_step)(state, batch, rng)

    mesh = tp.get_2d_mesh(n_model=2)
    tp_state = tp.shard_state(state, mesh)
    step = tp.make_tp_train_step(algo, tx, MEAN, STD, mesh)
    new_state, log, _ = step(tp_state, tp.shard_batch_2d(batch, mesh),
                             rng)
    np.testing.assert_allclose(float(log['loss']),
                               float(ref_log['loss']), rtol=1e-4)
    qkv = new_state.params['backbone_mod']['block0']['qkv']['kernel']
    assert qkv.sharding.spec == P(None, 'model')


def test_train_cli_tp_flag_reaches_cfg(tmp_path):
    """tools/train.py --tp N lands in cfg.parallel.tp (merged, not
    clobbering other parallel keys)."""
    import os.path as osp
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))
    import importlib
    train_cli = importlib.import_module('train')

    cfg_file = tmp_path / 'c.py'
    cfg_file.write_text("parallel = dict(other=1)\nmodel = dict()\n")
    args = train_cli.parse_args([str(cfg_file), '--tp', '2'])
    from pfst_tpu.utils.config import Config
    cfg = Config.fromfile(args.config)
    if args.tp:
        cfg.merge_from_dict({'parallel.tp': args.tp})
    assert cfg.parallel['tp'] == 2
    assert cfg.parallel['other'] == 1
