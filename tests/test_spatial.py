"""Spatially-partitioned whole-scene inference
(`pfst_tpu/parallel/spatial.py`): H-sharded forward must match the
single-device whole-mode forward exactly (layout-only sharding)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from conftest import tiny_model_cfg
from pfst_tpu.models import build_segmentor
from pfst_tpu.parallel import spatial


def _model_and_vars(size=64):
    model = build_segmentor(tiny_model_cfg())
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(
        lambda r, im: model.init({'params': r}, im,
                                 train=False))(rng, small)
    return model, variables


def test_spatial_matches_single_device():
    model, variables = _model_and_vars()
    scene = jnp.asarray(
        np.random.RandomState(0).randn(128, 64, 3), jnp.float32)

    ref, _ = jax.jit(lambda v, im: model.apply(
        v, im, method=model.inference))(variables, scene[None])
    out = spatial.spatial_inference(model, variables, scene)
    assert out.shape == ref[0].shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)


def test_spatial_is_actually_sharded():
    model, variables = _model_and_vars()
    scene = jnp.asarray(
        np.random.RandomState(1).randn(2, 128, 64, 3), jnp.float32)
    cache = {}
    out = spatial.spatial_inference(model, variables, scene,
                                    jit_cache=cache)
    assert out.shape[:3] == (2, 128, 64)
    assert out.sharding.spec == P(None, 'data')
    shard_heights = {s.data.shape[1] for s in out.addressable_shards}
    assert shard_heights == {128 // 8}
    # cache reuse: same shape -> same compiled fn object
    assert len(cache) == 1
    out2 = spatial.spatial_inference(model, variables, scene,
                                     jit_cache=cache)
    assert len(cache) == 1
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_spatial_rejects_indivisible_height():
    model, variables = _model_and_vars()
    scene = jnp.zeros((100, 64, 3), jnp.float32)
    try:
        spatial.spatial_inference(model, variables, scene)
        raise AssertionError('expected divisibility assert')
    except AssertionError as e:
        assert 'not divisible' in str(e)


# ---- spatially-sharded TRAINING (GSPMD step, exact vs 1-device) ----

def _tiny_uda_algo():
    import optax
    from pfst_tpu.models import build_train_model
    aux = [dict(type='PFGSTLoss', kernel_size=3, dilation=1, top_k=3,
                weights={'src_pos': 0.1, 'src_neg': 0.1,
                         'sim_pos': 0.1, 'sim_neg': 0.1,
                         'src_pos_std': 0.1, 'src_neg_std': 0.1},
                sim_type='cosine', feat_level=None,
                detach_unfold=True, downscale=0.5)]
    cfg = dict(
        uda=dict(type='PFGST', alpha=0.99, pseudo_threshold=0.9,
                 pseudo_weight_ignore_top=0,
                 pseudo_weight_ignore_bottom=0,
                 imnet_feature_dist_lambda=0, mix='class', blur=False,
                 color_jitter_strength=0.2,
                 color_jitter_probability=0.2,
                 use_decoded_feats=True, thre_type='all',
                 aux_losses=aux),
        model=tiny_model_cfg(), runner=dict(max_iters=10))
    algo = build_train_model(cfg)
    # SGD for post-step param comparison: adaptive optimizers amplify
    # reduction-order noise through the sign/scale of the update.
    tx = optax.sgd(1e-2)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    return algo, tx, state


def _uda_batch(b=2, h=64, w=32):
    rs = np.random.RandomState(0)
    return dict(
        img=jnp.asarray(rs.randn(b, h, w, 3), jnp.float32),
        gt_semantic_seg=jnp.asarray(rs.randint(0, 6, (b, h, w))),
        target_img=jnp.asarray(rs.randn(b, h, w, 3), jnp.float32),
        target_img_strong_aug=jnp.asarray(rs.randn(b, h, w, 3),
                                          jnp.float32))

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


def _assert_trees_close(a, b, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=0)


def test_spatial_step_disables_merged_passes():
    """Regression guard for the GSPMD miscompile: vmapping the model
    over stacked student slices with the operand sharded on both the
    batch ('data' size N > 1) and a spatial axis produces exactly-N x
    conv gradients (jax 0.9.0; tools/repro_gspmd_vmap_conv_grad.py).
    The spatial step must build the sequential inner step on dp>1
    meshes — and KEEP the merged pass on dp=1 meshes, which the repro
    shows are unaffected."""
    algo, tx, _ = _tiny_uda_algo()
    assert getattr(algo, 'merge_student_passes', False), \
        'precondition: merging is the default'
    mesh = spatial.get_spatial_mesh(4)  # data=2: buggy layout
    step = spatial.make_spatial_train_step(algo, tx, MEAN, STD, mesh)
    assert step.merged_student_passes is False
    # and the algo itself is untouched (copy, not mutation)
    assert algo.merge_student_passes is True

    # dp=1 (sp-only, the tall-crop headline case): merge is kept
    mesh1 = spatial.get_spatial_mesh(8)
    step1 = spatial.make_spatial_train_step(algo, tx, MEAN, STD, mesh1)
    assert step1.merged_student_passes is True

    # the DomainAdaptor family gates merging on cfg, not an attribute
    from conftest import tiny_model_cfg as tm
    from pfst_tpu.models.builder import SEGMENTORS
    cfg = tm()
    adaptor = SEGMENTORS.build(dict(
        type='DomainAdaptor', backbone=cfg['backbone'],
        decode_head=cfg['decode_head'],
        auxiliary_head=cfg['auxiliary_head'], weight_trg=0.5,
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    assert adaptor.cfg.get('merge_student_passes', True)
    import optax
    step_a = spatial.make_spatial_train_step(
        adaptor, optax.sgd(1e-2), MEAN, STD, mesh)
    assert step_a.merged_student_passes is False
    assert adaptor.cfg.get('merge_student_passes', True)  # untouched


def test_spatial_train_step_matches_single_device():
    """Full PFGST UDA step with the crop's H axis sharded 2 (dp) x 4
    (sp): params, EMA params, BN stats and every log var must match
    the single-device step (GSPMD layout-only; global BN = the
    single-device semantics)."""
    algo, tx, state = _tiny_uda_algo()
    batch = _uda_batch()
    rng = jax.random.PRNGKey(1)

    ref_step = algo.make_train_step(tx, MEAN, STD, donate=False)
    ref_state, ref_lv, _ = ref_step(state, batch, rng)

    mesh = spatial.get_spatial_mesh(4)
    assert dict(mesh.shape) == {'data': 2, 'spatial': 4}
    from jax.sharding import NamedSharding
    state_dev = jax.device_put(state, NamedSharding(mesh, P()))
    step = spatial.make_spatial_train_step(algo, tx, MEAN, STD, mesh)
    sp_batch = spatial.shard_spatial_batch(batch, mesh)
    # the batch really is H-sharded
    assert sp_batch['img'].sharding.spec == P('data', 'spatial')
    sp_state, sp_lv, _ = step(state_dev, sp_batch, rng)

    for k in ref_lv:
        # acc_seg is a discrete argmax pixel count: near-tied
        # random-init logits can flip a few pixels under different
        # fusion/reduction order (0.5pp budget). Continuous terms
        # carry only fp32 noise: the sharded step runs the sequential
        # student passes (see make_spatial_train_step) while the
        # reference default merges them, so the comparison includes
        # the (algebraically exact) merged-vs-sequential fp
        # reassociation.
        atol = 0.5 if 'acc' in k else 1e-4
        np.testing.assert_allclose(float(sp_lv[k]), float(ref_lv[k]),
                                   atol=atol, err_msg=k)
    _assert_trees_close(sp_state.params, ref_state.params, atol=2e-5)
    _assert_trees_close(sp_state.ema_params, ref_state.ema_params,
                        atol=2e-5)
    _assert_trees_close(sp_state.batch_stats, ref_state.batch_stats,
                        atol=2e-5)


def test_spatial_train_sp_only_mesh():
    """sp=8, dp=1: the tall-crop case one chip could not hold."""
    algo, tx, state = _tiny_uda_algo()
    batch = _uda_batch(b=1, h=64, w=32)
    rng = jax.random.PRNGKey(2)
    ref_state, ref_lv, _ = algo.make_train_step(
        tx, MEAN, STD, donate=False)(state, batch, rng)

    mesh = spatial.get_spatial_mesh(8)
    from jax.sharding import NamedSharding
    state_dev = jax.device_put(state, NamedSharding(mesh, P()))
    step = spatial.make_spatial_train_step(algo, tx, MEAN, STD, mesh)
    sp_state, sp_lv, _ = step(
        state_dev, spatial.shard_spatial_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(sp_lv['loss']),
                               float(ref_lv['loss']), atol=5e-3)
    _assert_trees_close(sp_state.params, ref_state.params, atol=2e-5)


import pytest


@pytest.mark.parametrize('par', [dict(sp=2), dict(sp=2, spw=2)])
def test_train_segmentor_end_to_end_sp(tmp_path, par):
    """Full train loop with cfg.parallel.sp=2 (and the 2-D sp x spw
    grid) — the apis/train.py wiring (state placement, spatial batch
    sharding, step build) mirrors tests/test_tp.py's tp loop test."""
    import os

    import cv2

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
        model=tiny_model_cfg(),
        parallel=dict(par),
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
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state.params))


def test_train_cli_sp_flag_reaches_cfg(tmp_path):
    """tools/train.py --sp N lands in cfg.parallel.sp without
    clobbering other parallel keys."""
    import importlib
    import os.path as osp
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))
    train_cli = importlib.import_module('train')

    cfg_file = tmp_path / 'c.py'
    cfg_file.write_text("parallel = dict(other=1)\nmodel = dict()\n")
    args = train_cli.parse_args([str(cfg_file), '--sp', '2'])
    from pfst_tpu.utils.config import Config
    cfg = Config.fromfile(args.config)
    if args.sp:
        cfg.merge_from_dict({'parallel.sp': args.sp})
    assert cfg.parallel['sp'] == 2
    assert cfg.parallel['other'] == 1


# ---- 2-D (H x W) spatial grids ----

def test_spatial2d_inference_matches_single_device():
    """grid=(2, 4): the scene partitioned on an H x W device grid —
    for scenes so large even one H stripe exceeds a chip — must match
    the single-device whole-mode forward."""
    model, variables = _model_and_vars()
    scene = jnp.asarray(
        np.random.RandomState(2).randn(128, 64, 3), jnp.float32)
    ref, _ = jax.jit(lambda v, im: model.apply(
        v, im, method=model.inference))(variables, scene[None])
    out = spatial.spatial_inference(model, variables, scene,
                                    grid=(2, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    # really partitioned in both axes: each shard holds 64x16
    shard_shapes = {s.data.shape[:2]
                    for s in out.addressable_shards}
    assert shard_shapes == {(128 // 2, 64 // 4)}


def test_spatial2d_train_step_matches_single_device():
    """Full PFGST UDA step on a (data=2, spatial=2, spatial_w=2)
    mesh: both crop axes sharded; same exactness bars as the 1-D
    test."""
    algo, tx, state = _tiny_uda_algo()
    batch = _uda_batch(b=2, h=64, w=32)
    rng = jax.random.PRNGKey(3)
    ref_state, ref_lv, _ = algo.make_train_step(
        tx, MEAN, STD, donate=False)(state, batch, rng)

    mesh = spatial.get_spatial_mesh(2, 2)
    assert dict(mesh.shape) == {'data': 2, 'spatial': 2,
                                'spatial_w': 2}
    from jax.sharding import NamedSharding
    state_dev = jax.device_put(state, NamedSharding(mesh, P()))
    step = spatial.make_spatial_train_step(algo, tx, MEAN, STD, mesh)
    sp_batch = spatial.shard_spatial_batch(batch, mesh)
    assert sp_batch['img'].sharding.spec == P('data', 'spatial',
                                              'spatial_w')
    sp_state, sp_lv, _ = step(state_dev, sp_batch, rng)
    for k in ref_lv:
        atol = 0.5 if 'acc' in k else 1e-4
        np.testing.assert_allclose(float(sp_lv[k]), float(ref_lv[k]),
                                   atol=atol, err_msg=k)
    _assert_trees_close(sp_state.params, ref_state.params, atol=2e-5)
    _assert_trees_close(sp_state.batch_stats, ref_state.batch_stats,
                        atol=2e-5)
