"""Every UDA algorithm's fused step traces and runs one iteration."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from conftest import tiny_model_cfg
from pfst_tpu.models import build_train_model

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]

def _aux(feat_level=None):
    return [dict(type='PFGSTLoss', kernel_size=3, dilation=1, top_k=3,
                 weights={'src_pos': 0.1, 'src_neg': 0.1,
                          'sim_pos': 0.1, 'sim_neg': 0.1,
                          'src_pos_std': 0.1, 'src_neg_std': 0.1},
                 sim_type='cosine', feat_level=feat_level,
                 detach_unfold=True, downscale=0.5)]


# feat_level=None is only valid with use_decoded_feats=True (single
# tensor); backbone-feature variants index a pyramid level — same
# constraint as the reference loss.
AUX = _aux(None)
AUX3 = _aux(3)


def _uda_cfg(uda_type, **over):
    base = dict(type=uda_type, alpha=0.99, pseudo_threshold=0.9,
                pseudo_weight_ignore_top=0,
                pseudo_weight_ignore_bottom=0,
                imnet_feature_dist_lambda=0, mix='class', blur=False,
                color_jitter_strength=0.2,
                color_jitter_probability=0.2,
                print_grad_magnitude=False)
    base.update(over)
    return dict(uda=base, model=tiny_model_cfg(),
                runner=dict(max_iters=10))


def _batch(b=2, h=32, w=32):
    rs = np.random.RandomState(0)
    return dict(
        img=jnp.asarray(rs.randn(b, h, w, 3), jnp.float32),
        gt_semantic_seg=jnp.asarray(rs.randint(0, 6, (b, h, w))),
        target_img=jnp.asarray(rs.randn(b, h, w, 3), jnp.float32),
        target_img_strong_aug=jnp.asarray(rs.randn(b, h, w, 3),
                                          jnp.float32))


def _run_one(cfg):
    algo = build_train_model(cfg)
    tx = optax.adamw(1e-3)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    step = algo.make_train_step(tx, MEAN, STD, donate=False)
    state2, log_vars, _ = step(state, _batch(), jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(log_vars['loss']))
    return log_vars


@pytest.mark.parametrize('uda_type,extra', [
    ('PFGST', dict(use_decoded_feats=True, thre_type='all',
                   aux_losses=AUX)),
    ('PFGST', dict(use_decoded_feats=False, thre_type='part',
                   aux_losses=AUX3)),
    ('PFST', dict(aux_losses=AUX3)),
    ('PFSTV4', dict(aux_losses=AUX3)),
    ('DACS', dict()),
    ('DACS', dict(imnet_feature_dist_lambda=0.005)),
    ('PGST', dict(aux_losses=AUX3, feat_level=3)),
    ('PGSTMixFeat', dict(aux_losses=AUX3, feat_level=3)),
    ('PGSTV4', dict(aux_losses=AUX3, feat_level=3)),
    ('PGSTTRG', dict(aux_losses=AUX3)),
    ('FMDA', dict(aux_losses=AUX3)),
    ('FMDAMix', dict(aux_losses=AUX3, feat_level=3)),
])
def test_uda_variant_step(uda_type, extra):
    log_vars = _run_one(_uda_cfg(uda_type, **extra))
    if uda_type in ('PGSTTRG', 'FMDA'):
        assert any(k.startswith('trg.') for k in log_vars)
    elif uda_type != 'DACS' or True:
        assert any(k.startswith('mix.') or k.startswith('trg.')
                   for k in log_vars)
    if extra.get('imnet_feature_dist_lambda'):
        assert 'loss_imnet_feat_dist' in log_vars


def test_adversarial_adaptor_step():
    cfg = tiny_model_cfg()
    from pfst_tpu.models.builder import SEGMENTORS
    adaptor = SEGMENTORS.build(dict(
        type='DomainAdaptorAdv',
        backbone=cfg['backbone'],
        decode_head=cfg['decode_head'],
        auxiliary_head=None,
        discriminator=dict(type='FCDiscriminator', num_in_channels=6,
                           ndf=8),
        gen_losses=[dict(type='AdvLoss', loss_type='advent',
                         net_type='gen',
                         weights={'loss_gen': 0.01})],
        disc_losses=[dict(type='AdvLoss', loss_type='advent',
                          net_type='disc',
                          weights={'loss_disc_src': 0.5,
                                   'loss_disc_trg': 0.5})],
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    tx = optax.adam(1e-4)
    # 64^2 inputs: head logits are 16^2 and survive the discriminator's
    # five stride-2 convs (the reference runs it on 128^2 logits)
    state = adaptor.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    step = adaptor.make_train_step(tx, MEAN, STD, donate=False)
    b = _batch(h=64, w=64)
    state2, log_vars, _ = step(state, b, jax.random.PRNGKey(1))
    assert 'loss_gen' in log_vars and 'loss_disc_src' in log_vars
    assert np.isfinite(float(log_vars['loss']))
    # discriminator params moved
    moved = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()),
                         state.disc_params, state2.disc_params)
    assert max(jax.tree.leaves(moved)) > 0


def test_adv_sharded_step_matches_single_device():
    """DomainAdaptorAdv under the dp mesh: the shard_map path (pmean'd
    disc grads inside the generator's value_and_grad + pmean'd gen
    grads) must reproduce the single-device step exactly when every
    replica sees identical data (per-replica BN batch stats then equal
    the full-batch stats).  Compares POST-STEP params of BOTH networks
    (SGD; loss-level agreement alone is not sufficient evidence for a
    sharded training path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pfst_tpu.parallel.mesh import (get_mesh,
                                        make_sharded_train_step,
                                        shard_batch)
    cfg = tiny_model_cfg()
    # dropout off: the dp path folds a per-replica rng (per-rank torch
    # seeds), which must not enter this exact-equivalence comparison
    cfg['decode_head']['dropout_ratio'] = 0.0
    from pfst_tpu.models.builder import SEGMENTORS
    adaptor = SEGMENTORS.build(dict(
        type='DomainAdaptorAdv',
        backbone=cfg['backbone'],
        decode_head=cfg['decode_head'],
        auxiliary_head=None,
        discriminator=dict(type='FCDiscriminator', num_in_channels=6,
                           ndf=8),
        gen_losses=[dict(type='AdvLoss', loss_type='advent',
                         net_type='gen', weights={'loss_gen': 0.02})],
        disc_losses=[dict(type='AdvLoss', loss_type='advent',
                          net_type='disc',
                          weights={'loss_disc_src': 0.5,
                                   'loss_disc_trg': 0.5})],
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    tx = {'generator': optax.sgd(1e-2),
          'discriminator': optax.sgd(5e-2)}
    state = adaptor.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3),
                               tx)
    n = jax.device_count()
    rs = np.random.RandomState(2)
    one = {
        'img': rs.randn(1, 64, 64, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(0, 6, (1, 64, 64)).astype(
            np.int32),
        'target_img': rs.randn(1, 64, 64, 3).astype(np.float32),
    }
    batch = {k: jnp.asarray(np.repeat(v, n, axis=0))
             for k, v in one.items()}
    rng = jax.random.PRNGKey(4)

    single = adaptor.make_train_step(tx, MEAN, STD, donate=False)
    s1, lv1, _ = single(state, batch, rng)

    mesh = get_mesh()
    sh_step = make_sharded_train_step(adaptor, tx, MEAN, STD, mesh)
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    s2, lv2, _ = sh_step(state_r, shard_batch(batch, mesh), rng)

    for k in lv1:
        np.testing.assert_allclose(float(lv1[k]), float(lv2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    # batch_stats tolerance is looser: the full-batch var reduces over
    # 8xHxW in one pass while the dp path reduces per-shard then
    # pmeans — same math, different float summation order (~2e-5)
    for name, a, b, tol in (
            ('params', s1.params, s2.params, 1e-5),
            ('disc_params', s1.disc_params, s2.disc_params, 1e-5),
            ('batch_stats', s1.batch_stats, s2.batch_stats, 1e-4)):
        d = jax.tree.map(lambda x, y: float(jnp.abs(x - y).max()), a, b)
        assert max(jax.tree.leaves(d)) < tol, (
            name, {k: v for k, v in
                   jax.tree_util.tree_leaves_with_path(d) if v > tol})


def test_split_compile_matches_fused():
    """split_compile runs two XLA programs but must produce the same
    losses/updates as the fused step under the same rng."""
    cfg = _uda_cfg('PFGST', use_decoded_feats=True, thre_type='all',
                   aux_losses=AUX)
    algo = build_train_model(cfg)
    tx = optax.adamw(1e-3)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    b = _batch()
    rng = jax.random.PRNGKey(7)
    fused = algo.make_train_step(tx, MEAN, STD, donate=False)
    split = algo.make_train_step(tx, MEAN, STD, donate=False,
                                 split_compile=True)
    s1, lv1, _ = fused(state, b, rng)
    s2, lv2, _ = split(state, b, rng)
    for k in lv1:
        np.testing.assert_allclose(float(lv1[k]), float(lv2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    d = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()),
                     s1.params, s2.params)
    assert max(jax.tree.leaves(d)) < 1e-6


def test_merged_student_passes():
    """The vmapped merged {source, mixed} student pass (default) must
    equal the sequential two-pass path: identical losses/log_vars,
    identical post-step params, and the exact sequential BN
    running-stat composition bs2 = m*bs1 + (1-m)*mu2 (recovered as
    m*u1 + u2 - m*bs0).  Dropout is active in both heads (ratio 0.1)
    so the per-pass dropout-key parity is exercised too.

    SGD (not AdamW) on purpose: post-step params are then
    params - lr*grad, so the check reads the raw gradient delta
    (measured 2e-7 — fp reassociation of the batched convs).  AdamW's
    first step is ~lr*sign(grad), which amplifies any last-ulp
    gradient difference near zero to a full lr-sized delta and says
    nothing about equivalence."""
    kw = dict(use_decoded_feats=True, thre_type='all', aux_losses=AUX)
    cfg_m = _uda_cfg('PFGST', merge_student_passes=True, **kw)
    cfg_s = _uda_cfg('PFGST', merge_student_passes=False, **kw)
    tx = optax.sgd(1e-2)
    b = _batch()
    rng = jax.random.PRNGKey(7)
    algo_m = build_train_model(cfg_m)
    algo_s = build_train_model(cfg_s)
    state_m = algo_m.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3),
                                tx)
    state_s = algo_s.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3),
                                tx)
    sm, lvm, _ = algo_m.make_train_step(tx, MEAN, STD, donate=False)(
        state_m, b, rng)
    ss, lvs, _ = algo_s.make_train_step(tx, MEAN, STD, donate=False)(
        state_s, b, rng)
    assert set(lvm) == set(lvs)
    for k in lvm:
        np.testing.assert_allclose(float(lvm[k]), float(lvs[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    dp = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()),
                      sm.params, ss.params)
    assert max(jax.tree.leaves(dp)) < 1e-5
    db = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()),
                      sm.batch_stats, ss.batch_stats)
    assert max(jax.tree.leaves(db)) < 5e-5


def test_bf16_mixed_precision_training_step():
    """model.dtype='bfloat16' trains with bf16 compute, fp32 params,
    fp32 losses — the TPU-native mixed-precision mode (the reference
    has no AMP path)."""
    cfg = _uda_cfg('PFGST', use_decoded_feats=True, thre_type='all',
                   aux_losses=AUX)
    cfg['model']['dtype'] = 'bfloat16'
    algo = build_train_model(cfg)
    tx = optax.adamw(1e-3)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    # params stay fp32
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.params))
    step = algo.make_train_step(tx, MEAN, STD, donate=False)
    state2, log_vars, _ = step(state, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(log_vars['loss']))
    moved = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()),
                         state.params, state2.params)
    assert max(jax.tree.leaves(moved)) > 0
    # loss close to the fp32 run under the same rng
    cfg32 = _uda_cfg('PFGST', use_decoded_feats=True, thre_type='all',
                     aux_losses=AUX)
    algo32 = build_train_model(cfg32)
    state32 = algo32.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3),
                                tx)
    step32 = algo32.make_train_step(tx, MEAN, STD, donate=False)
    _, lv32, _ = step32(state32, _batch(), jax.random.PRNGKey(1))
    assert abs(float(log_vars['loss']) - float(lv32['loss'])) < \
        0.05 * max(1.0, abs(float(lv32['loss'])))


def test_pfstv4_output_side_replay():
    """PFSTV4 must replay the geometric metas onto the teacher's
    OUTPUTS (``pfst_v4.py:250-258``), not its input: CNNs are not
    rot90/flip-equivariant, so the two differ."""
    from pfst_tpu.models.utils.pfst_transforms import transform_by_metas

    cfg = _uda_cfg('PFSTV4', aux_losses=AUX3)
    algo = build_train_model(cfg)
    tx = optax.adamw(1e-3)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)

    b = dict(_batch())
    metas = dict(rotate_k=jnp.asarray([1, 2], jnp.int32),
                 flip_horizontal=jnp.asarray([1, 0], jnp.int32),
                 flip_vertical=jnp.asarray([0, 1], jnp.int32))
    ori = b['target_img']
    b['target_img'] = transform_by_metas(ori, metas, scale=1.0)
    b['target_img_strong_aug'] = b['target_img']
    b['target_img_ori'] = ori
    b.update(metas)

    premix = algo.teacher_and_mix(
        state.ema_params, state.ema_batch_stats, b,
        jax.random.PRNGKey(1), jnp.asarray(MEAN), jnp.asarray(STD))

    # shipped semantics: teacher on the clean view, outputs re-aligned
    logits_clean, feats_clean = algo.teacher_forward(
        state.ema_params, state.ema_batch_stats, ori)
    want_logits = transform_by_metas(logits_clean, metas, scale=1.0)
    np.testing.assert_allclose(np.asarray(premix['ema_logits']),
                               np.asarray(want_logits),
                               rtol=1e-5, atol=1e-6)
    lvl = algo.feat_level
    want_feat = transform_by_metas(
        feats_clean[lvl], metas,
        scale=feats_clean[lvl].shape[1] / ori.shape[1])
    # teacher_and_mix returns ema_feats stop-gradient'ed; compare level
    got = premix['ema_feats'][lvl]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_feat),
                               rtol=1e-5, atol=1e-6)

    # input-side replay (teacher on the pre-rotated image) is NOT
    # equivalent — the round-1 implementation was wrong
    logits_input_side, _ = algo.teacher_forward(
        state.ema_params, state.ema_batch_stats, b['target_img'])
    diff = np.abs(np.asarray(logits_input_side) -
                  np.asarray(want_logits)).max()
    scale = np.abs(np.asarray(want_logits)).max()
    assert diff > 1e-3 * scale, (
        f'toy model unexpectedly equivariant (diff={diff})')

    # the fused train step runs end-to-end with the V4 batch keys
    step = algo.make_train_step(tx, MEAN, STD, donate=False)
    state2, log_vars, _ = step(state, b, jax.random.PRNGKey(2))
    assert int(state2.step) == 1
    assert np.isfinite(float(log_vars['loss']))


def test_fmda_adaptor_sim_feat_step():
    """FMDAAdaptor: joint src+trg CE + loss_sim_feat over precomputed
    neighborhood-similarity maps in the batch (fmda_adaptor.py:190-)."""
    cfg = tiny_model_cfg()
    from pfst_tpu.models.builder import SEGMENTORS
    adaptor = SEGMENTORS.build(dict(
        type='FMDAAdaptor',
        backbone=cfg['backbone'],
        decode_head=cfg['decode_head'],
        auxiliary_head=None,
        weight_trg=0.5,
        loss_sim_feat=dict(type='FeatSimLossV2', top_k=2, dilation=1,
                           kernel_size=3, weights=[(0.3, 0.3)]),
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    tx = optax.adam(1e-4)
    state = adaptor.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    step = adaptor.make_train_step(tx, MEAN, STD, donate=False)
    b = _batch()
    rs = np.random.RandomState(0)
    b['target_gt_semantic_seg'] = b['gt_semantic_seg']
    b['gaussian_sim_feat_2'] = jnp.asarray(
        rs.rand(2, 8, 8, 9).astype(np.float32))
    b['rotate_k'] = jnp.asarray([1, 0], jnp.int32)
    state2, log_vars, _ = step(state, b, jax.random.PRNGKey(1))
    assert 'loss_sim_pos_0' in log_vars and 'loss_sim_neg_0' in log_vars
    assert 'src.dec.decode.loss_ce' in log_vars
    assert 'trg.dec.decode.loss_ce' in log_vars
    assert np.isfinite(float(log_vars['loss']))
    moved = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()),
                         state.params, state2.params)
    assert max(jax.tree.leaves(moved)) > 0


def test_domain_adaptor_merged_passes():
    """DomainAdaptor's merged {src, trg} vmapped pass (default) must
    equal the sequential two-apply path: identical losses and the
    composed BN running stats.  SGD comparison for the same reason as
    test_merged_student_passes: post-step params then read the raw
    gradient delta instead of AdamW's sign-amplified one."""
    cfg = tiny_model_cfg()
    from pfst_tpu.models.builder import SEGMENTORS

    def mk(merge):
        return SEGMENTORS.build(dict(
            type='DomainAdaptor',
            backbone=cfg['backbone'],
            decode_head=cfg['decode_head'],
            auxiliary_head=cfg['auxiliary_head'],
            weight_trg=0.5,
            merge_student_passes=merge,
            train_cfg=dict(), test_cfg=dict(mode='whole')))

    tx = optax.sgd(1e-2)
    b = _batch()
    b['target_gt_semantic_seg'] = b['gt_semantic_seg'][:, :, ::-1]
    rng = jax.random.PRNGKey(3)
    outs = []
    for merge in (True, False):
        adaptor = mk(merge)
        state = adaptor.init_state(jax.random.PRNGKey(0),
                                   (1, 32, 32, 3), tx)
        step = adaptor.make_train_step(tx, MEAN, STD, donate=False)
        outs.append(step(state, b, rng))
    (sm, lvm, _), (ss, lvs, _) = outs
    assert 'trg.decode.loss_ce' in lvm
    assert set(lvm) == set(lvs)
    for k in lvm:
        np.testing.assert_allclose(float(lvm[k]), float(lvs[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    dp = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()),
                      sm.params, ss.params)
    assert max(jax.tree.leaves(dp)) < 1e-5
    db = jax.tree.map(lambda a, c: float(jnp.abs(a - c).max()),
                      sm.batch_stats, ss.batch_stats)
    assert max(jax.tree.leaves(db)) < 5e-5


def test_domain_adaptor_v2_aux_losses():
    """DomainAdaptorV2 (domain_adaptorv2.py:245-291): source CE +
    tensors-dict aux losses (here EntropyLoss on the target logits),
    and — faithfully to the reference — NO supervised target loss:
    the target pass only feeds logits/features into the aux losses.
    The plain DomainAdaptor rejects aux_losses (the reference class
    has no such argument)."""
    cfg = tiny_model_cfg()
    from pfst_tpu.models.builder import SEGMENTORS
    adaptor = SEGMENTORS.build(dict(
        type='DomainAdaptorV2',
        backbone=cfg['backbone'],
        decode_head=cfg['decode_head'],
        auxiliary_head=cfg['auxiliary_head'],
        weight_trg=0.5,  # accepted-but-dead, as in the reference
        aux_losses=[dict(type='EntropyLoss', loss_type='entropy',
                         weights={'loss_ent': 0.01})],
        train_cfg=dict(), test_cfg=dict(mode='whole')))
    tx = optax.adam(1e-4)
    state = adaptor.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3), tx)
    step = adaptor.make_train_step(tx, MEAN, STD, donate=False)
    b = _batch()
    b['target_gt_semantic_seg'] = b['gt_semantic_seg']
    state2, log_vars, _ = step(state, b, jax.random.PRNGKey(1))
    assert 'loss_ent' in log_vars
    assert 'decode.loss_ce' in log_vars and 'aux.loss_ce' in log_vars
    # no supervised target CE anywhere (ref V2 total:
    # loss_dec_src + loss_aux + loss_aux_src, domain_adaptorv2.py:289)
    assert not any(k.startswith(('trg', 'src.trg')) for k in log_vars)
    assert np.isfinite(float(log_vars['loss']))
    np.testing.assert_allclose(
        float(log_vars['loss']),
        float(log_vars['decode.loss_ce']) +
        float(log_vars['aux.loss_ce']) + float(log_vars['loss_ent']),
        rtol=1e-6)

    with pytest.raises(ValueError, match='DomainAdaptorV2'):
        SEGMENTORS.build(dict(
            type='DomainAdaptor', backbone=cfg['backbone'],
            decode_head=cfg['decode_head'], auxiliary_head=None,
            aux_losses=[dict(type='EntropyLoss',
                             weights={'loss_ent': 0.01})],
            train_cfg=dict(), test_cfg=dict(mode='whole')))
