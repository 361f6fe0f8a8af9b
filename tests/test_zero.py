"""ZeRO-1 optimizer-state partitioning over the data mesh —
`pfst_tpu/parallel/zero.py`. The sharding is layout-only: the step
must compute the same numbers as the single-device step, while the
AdamW moments are physically partitioned (not replicated) across
devices."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from pfst_tpu.apis.train import SupervisedTrainer
from pfst_tpu.models import build_segmentor
from pfst_tpu.parallel import zero
from pfst_tpu.parallel.mesh import get_mesh

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


def _cnn_cfg(num_classes=6):
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
    algo = SupervisedTrainer(build_segmentor(_cnn_cfg()))
    tx = optax.adamw(1e-3, weight_decay=0.01)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    return algo, tx, state


def test_zero_specs_partition_opt_state(setup):
    algo, tx, state = setup
    mesh = get_mesh()
    specs = zero.zero_specs(state, mesh)
    # params stay replicated
    assert all(s == P() for s in jax.tree.leaves(
        specs.params, is_leaf=lambda x: isinstance(x, P)))
    # every optimizer leaf with a dimension >= 8 is partitioned over
    # 'data' on its largest dimension; scalars/small leaves replicated
    flat_state = jax.tree_util.tree_flatten_with_path(
        state.opt_state)[0]
    flat_spec = jax.tree_util.tree_flatten_with_path(
        specs.opt_state,
        is_leaf=lambda x: isinstance(x, P))[0]
    assert len(flat_state) == len(flat_spec)
    n_sharded = 0
    for (path, leaf), (_, spec) in zip(flat_state, flat_spec):
        divisible = [d for d in range(leaf.ndim)
                     if leaf.shape[d] >= 8 and leaf.shape[d] % 8 == 0]
        if divisible:
            big = max(divisible, key=lambda d: (leaf.shape[d], -d))
            assert spec[big] == 'data', (path, leaf.shape, spec)
            n_sharded += 1
        else:
            assert spec == P(), (path, leaf.shape, spec)
    assert n_sharded > 10  # the mu/nu mirrors of every real kernel


def test_zero_step_matches_single_device(setup):
    algo, tx, state = setup
    batch = _batch()
    rng = jax.random.PRNGKey(7)

    ref_step = algo.make_train_step(tx, MEAN, STD, donate=False)
    ref_state, ref_log, _ = ref_step(state, batch, rng)

    mesh = get_mesh()
    z_state = zero.shard_state(state, mesh)
    step = zero.make_zero_train_step(algo, tx, MEAN, STD, mesh)
    new_state, log, _ = step(z_state, zero.shard_batch(batch, mesh),
                             rng)
    np.testing.assert_allclose(float(log['loss']),
                               float(ref_log['loss']), rtol=1e-5)
    for r, t in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(t),
                                   rtol=2e-4, atol=2e-5)


def test_zero_opt_state_physically_partitioned(setup):
    algo, tx, state = setup
    mesh = get_mesh()
    z_state = zero.shard_state(state, mesh)
    step = zero.make_zero_train_step(algo, tx, MEAN, STD, mesh)
    new_state, _, _ = step(z_state, zero.shard_batch(_batch(), mesh),
                           jax.random.PRNGKey(7))
    stored, replicated = zero.opt_state_bytes(new_state)
    # AdamW: count scalars replicate, mu/nu partition. With every
    # large leaf split 8 ways the stored bytes must be well under half
    # of full replication.
    assert stored < 0.5 * replicated, (stored, replicated)
    # spot-check a shard's physical shape
    mu = new_state.opt_state[0].mu
    leaf = max(jax.tree.leaves(mu), key=lambda x: x.size)
    big = int(np.argmax(leaf.shape))
    shapes = {s.data.shape for s in leaf.addressable_shards}
    assert all(sh[big] <= -(-leaf.shape[big] // 8) for sh in shapes), (
        leaf.shape, shapes)


def test_zero_composes_with_tp(setup):
    from pfst_tpu.parallel import tp

    algo, tx, state = setup
    batch = _batch()
    rng = jax.random.PRNGKey(7)
    ref_step = algo.make_train_step(tx, MEAN, STD, donate=False)
    _, ref_log, _ = ref_step(state, batch, rng)

    mesh = tp.get_2d_mesh(n_model=2)
    z_state = zero.shard_state(state, mesh,
                               tp_rules=tp.DEFAULT_TP_RULES)
    step = zero.make_zero_train_step(algo, tx, MEAN, STD, mesh,
                                     tp_rules=tp.DEFAULT_TP_RULES)
    new_state, log, _ = step(z_state, zero.shard_batch(batch, mesh),
                             rng)
    np.testing.assert_allclose(float(log['loss']),
                               float(ref_log['loss']), rtol=1e-5)
    stored, replicated = zero.opt_state_bytes(new_state)
    assert stored < 0.5 * replicated


def test_train_segmentor_end_to_end_zero(tmp_path):
    """Full train loop with cfg.parallel.zero=True on the 8-device
    mesh: the apis/train.py dispatch must pick the ZeRO step and leave
    the optimizer state physically partitioned."""
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
        model=_cnn_cfg(),
        parallel=dict(zero=True),
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
    stored, replicated = zero.opt_state_bytes(state)
    assert stored < 0.5 * replicated
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state.params))


def test_zero3_params_partitioned_and_numerics_match(setup):
    """Level 3 (FSDP): params + optimizer moments both physically
    partitioned; the step still computes the single-device numbers."""
    algo, tx, state = setup
    batch = _batch()
    rng = jax.random.PRNGKey(7)
    ref_step = algo.make_train_step(tx, MEAN, STD, donate=False)
    ref_state, ref_log, _ = ref_step(state, batch, rng)

    mesh = get_mesh()
    z_state = zero.shard_state(state, mesh, level=3)
    p_stored, p_repl = zero.tree_bytes(z_state.params)
    assert p_stored < 0.5 * p_repl, (p_stored, p_repl)

    step = zero.make_zero_train_step(algo, tx, MEAN, STD, mesh,
                                     level=3)
    new_state, log, _ = step(z_state, zero.shard_batch(batch, mesh),
                             rng)
    np.testing.assert_allclose(float(log['loss']),
                               float(ref_log['loss']), rtol=1e-5)
    for r, t in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(new_state.params)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(t),
                                   rtol=2e-4, atol=2e-5)
    # params stayed partitioned through the step
    p_stored, p_repl = zero.tree_bytes(new_state.params)
    assert p_stored < 0.5 * p_repl
    o_stored, o_repl = zero.opt_state_bytes(new_state)
    assert o_stored < 0.5 * o_repl


def test_uda_pfgst_step_under_zero_matches_single_device():
    """Full PFGST UDA step under ZeRO-1: same numerics as the
    single-device step, optimizer state partitioned."""
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
        model=_cnn_cfg(),
        runner=dict(max_iters=100))
    algo = build_train_model(cfg)
    tx = optax.adamw(6e-5, weight_decay=0.01)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    rs = np.random.RandomState(0)
    b = 8
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

    mesh = get_mesh()
    z_state = zero.shard_state(state, mesh)
    step = zero.make_zero_train_step(algo, tx, MEAN, STD, mesh)
    new_state, log, _ = step(z_state, zero.shard_batch(batch, mesh),
                             rng)
    np.testing.assert_allclose(float(log['loss']),
                               float(ref_log['loss']), rtol=1e-4)
    stored, replicated = zero.opt_state_bytes(new_state)
    assert stored < 0.5 * replicated

    # level 3: student AND EMA-teacher trees partitioned, same numbers
    z3 = zero.shard_state(state, mesh, level=3)
    step3 = zero.make_zero_train_step(algo, tx, MEAN, STD, mesh,
                                      level=3)
    s3, log3, _ = step3(z3, zero.shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(log3['loss']),
                               float(ref_log['loss']), rtol=1e-4)
    for tree in (s3.params, s3.ema_params):
        st, rep = zero.tree_bytes(tree)
        assert st < 0.5 * rep, (st, rep)


def test_zero_composes_with_multisteps_and_nonfinite_guard(setup):
    """The wrapped optimizer (cumulative_iters + skip_nonfinite adds a
    param-shaped MultiSteps accumulator and ApplyIfFinite counters to
    opt_state) still partitions and matches the single-device step:
    iter 1 accumulates (params frozen), iter 2 applies the mean."""
    from pfst_tpu.core.optimizers import build_optimizer

    algo, _, _ = setup
    tx = build_optimizer(dict(type='AdamW', lr=1e-3,
                              weight_decay=0.01),
                         None, 100, cumulative_iters=2,
                         skip_nonfinite=2)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    batch, rng = _batch(), jax.random.PRNGKey(7)

    ref_step = algo.make_train_step(tx, MEAN, STD, donate=False)
    r1, _, _ = ref_step(state, batch, rng)
    r2, _, _ = ref_step(r1, batch, jax.random.fold_in(rng, 1))

    mesh = get_mesh()
    z_state = zero.shard_state(state, mesh)
    step = zero.make_zero_train_step(algo, tx, MEAN, STD, mesh)
    sb = zero.shard_batch(batch, mesh)
    z1, _, _ = step(z_state, sb, rng)
    # accumulation iteration: params frozen on both paths
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(z1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    z2, _, _ = step(z1, sb, jax.random.fold_in(rng, 1))
    for r, t in zip(jax.tree.leaves(r2.params),
                    jax.tree.leaves(z2.params)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(t),
                                   rtol=2e-4, atol=2e-5)
    # the accumulator tree partitioned like the moments
    stored, replicated = zero.opt_state_bytes(z2)
    assert stored < 0.5 * replicated, (stored, replicated)
