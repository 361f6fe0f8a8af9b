"""UDA component math: EMA schedule, pseudo-weights, ClassMix,
strong transforms — the tests the reference never had (SURVEY §4)."""
import jax
import os
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pfst_tpu.models.utils.dacs_transforms import (class_presence,
                                                   denorm,
                                                   get_class_masks,
                                                   one_mix, renorm,
                                                   sample_class_mask,
                                                   strong_transform)


def test_ema_schedule_matches_reference():
    """alpha_t = min(1 - 1/(iter+1), alpha) (``pfgst.py:116-127``);
    applied pre-forward, iter 0 copies the student."""
    from pfst_tpu.models.uda.uda_decorator import (UDADecorator,
                                                   UDATrainState)
    state = UDATrainState(
        params={'w': jnp.asarray(2.0)}, batch_stats={},
        ema_params={'w': jnp.asarray(10.0)}, ema_batch_stats={},
        opt_state=None, step=jnp.asarray(0))
    deco = UDADecorator.__new__(UDADecorator)  # only ema_update needed
    s0 = deco.ema_update(state, alpha=0.99)
    assert float(s0.ema_params['w']) == 2.0  # iter 0: copy
    s1 = deco.ema_update(s0.replace(step=jnp.asarray(1),
                                    ema_params={'w': jnp.asarray(4.0)}),
                         alpha=0.99)
    np.testing.assert_allclose(float(s1.ema_params['w']),
                               0.5 * 4.0 + 0.5 * 2.0)
    s9 = deco.ema_update(s0.replace(step=jnp.asarray(1000),
                                    ema_params={'w': jnp.asarray(4.0)}),
                         alpha=0.99)
    np.testing.assert_allclose(float(s9.ema_params['w']),
                               0.99 * 4.0 + 0.01 * 2.0, rtol=1e-6)


def test_class_presence_includes_255():
    labels = jnp.asarray([[[0, 1], [255, 3]]])
    pres = class_presence(labels, num_classes=6)
    assert bool(pres[0]) and bool(pres[1]) and bool(pres[3])
    assert bool(pres[6])  # the 255 slot — reference torch.unique
    assert not bool(pres[2])


def test_class_mask_selects_half_of_present():
    labels = jnp.asarray(np.random.RandomState(0).randint(0, 6,
                                                          (2, 16, 16)))
    masks = get_class_masks(jax.random.PRNGKey(0), labels, 6)
    assert masks.shape == (2, 16, 16)
    # pixels of the same class share the mask value per image
    lbl = np.asarray(labels[0])
    m = np.asarray(masks[0])
    for c in np.unique(lbl):
        vals = np.unique(m[lbl == c])
        assert len(vals) == 1
    # roughly half the present classes chosen
    chosen = {int(c) for c in np.unique(lbl) if m[lbl == c][0] == 1}
    present = set(np.unique(lbl).tolist())
    assert len(chosen) == (len(present) + len(present) % 2) // 2


def test_one_mix_blend():
    mask = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    a = jnp.full((2, 2, 3), 5.0)
    b = jnp.zeros((2, 2, 3))
    out = one_mix(mask, a, b)
    np.testing.assert_allclose(np.asarray(out)[..., 0],
                               [[5, 0], [0, 5]])


def test_denorm_renorm_roundtrip(rng):
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])
    x = jnp.asarray(rng.randn(4, 4, 3).astype(np.float32))
    y = renorm(denorm(x, mean, std), mean, std)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_strong_transform_gates():
    """jitter only above p, blur only above 0.5 — and determinism
    under a fixed key."""
    key = jax.random.PRNGKey(0)
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])
    img_s = jnp.asarray(np.random.RandomState(0).randn(16, 16, 3),
                        jnp.float32)
    img_t = jnp.asarray(np.random.RandomState(1).randn(16, 16, 3),
                        jnp.float32)
    mask = jnp.zeros((16, 16))
    # gates off -> pure blend (mask 0 -> target image)
    out, _ = strong_transform(key, mask, data_pair=(img_s, img_t),
                              jitter_gate=jnp.asarray(0.0),
                              blur_gate=jnp.asarray(0.0),
                              color_jitter_p=0.2, mean=mean, std=std)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img_t),
                               atol=1e-6)
    # jitter on -> changed
    out2, _ = strong_transform(key, mask, data_pair=(img_s, img_t),
                               jitter_gate=jnp.asarray(1.0),
                               blur_gate=jnp.asarray(0.0),
                               color_jitter_p=0.2, mean=mean, std=std)
    assert not np.allclose(np.asarray(out2), np.asarray(img_t))
    # deterministic under the same key
    out3, _ = strong_transform(key, mask, data_pair=(img_s, img_t),
                               jitter_gate=jnp.asarray(1.0),
                               blur_gate=jnp.asarray(0.0),
                               color_jitter_p=0.2, mean=mean, std=std)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out3))


def test_pseudo_weight_modes():
    """thre_type 'all' vs 'part' (``pfgst.py:264-268``)."""
    probs = jnp.asarray([[[0.99, 0.5], [0.99, 0.99]]])
    thr = 0.98
    large = probs >= thr
    frac = float(jnp.mean(large.astype(jnp.float32)))
    assert frac == 0.75
    part = np.asarray(large.astype(jnp.float32))[0]
    np.testing.assert_array_equal(part, [[1, 0], [1, 1]])


def test_ohem_sampler():
    from pfst_tpu.core.seg import OHEMPixelSampler
    logits = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32))
    label = jnp.asarray(np.random.RandomState(1).randint(0, 4, (1, 8, 8)))
    sampler = OHEMPixelSampler(thresh=0.7, min_kept=10)
    w = sampler.sample(logits, label)
    assert w.shape == (1, 8, 8)
    assert float(w.sum()) >= 1
    sampler2 = OHEMPixelSampler(min_kept=16)
    w2 = sampler2.sample(logits, label)
    assert 1 <= float(w2.sum()) <= 64


def test_lr_schedule_poly_warmup():
    from pfst_tpu.core.optimizers import build_lr_schedule
    sched = build_lr_schedule(
        dict(policy='poly', warmup='linear', warmup_iters=100,
             warmup_ratio=1e-6, power=1.0, min_lr=0.0),
        base_lr=6e-5, max_iters=1000)
    assert float(sched(0)) < 1e-9
    np.testing.assert_allclose(float(sched(100)), 6e-5 * 0.9, rtol=1e-4)
    np.testing.assert_allclose(float(sched(1000)), 0.0, atol=1e-12)
    mid = float(sched(500))
    np.testing.assert_allclose(mid, 6e-5 * 0.5, rtol=1e-5)


def test_layer_decay_optimizer():
    """layerwise LR decay: deeper layers get larger multipliers."""
    import jax.numpy as jnp
    from pfst_tpu.core.optimizers import build_optimizer
    tx = build_optimizer(
        dict(type='AdamW', lr=1e-3, weight_decay=0.01,
             paramwise_cfg=dict(decay_type='layer_wise', num_layers=4,
                                decay_rate=0.5)),
        lr_config=None, max_iters=100)
    params = {
        'backbone_mod': {
            'stem_conv1': {'conv': {'kernel': jnp.ones((4,))}},
            'layer4_block0': {'conv': {'kernel': jnp.ones((4,))}},
        },
        'decode_head_mod': {'cls': {'conv_seg':
                                    {'kernel': jnp.ones((4,))}}},
    }
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    stem_u = abs(float(
        updates['backbone_mod']['stem_conv1']['conv']['kernel'][0]))
    head_u = abs(float(
        updates['decode_head_mod']['cls']['conv_seg']['kernel'][0]))
    assert stem_u < head_u  # stem decayed harder than the head


def test_format_results(tmp_path, rng):
    import cv2
    from pfst_tpu.datasets import build_dataset
    root = tmp_path / 'ds'
    os.makedirs(root / 'img_dir' / 'val')
    os.makedirs(root / 'ann_dir' / 'val')
    for i in range(2):
        cv2.imwrite(str(root / 'img_dir' / 'val' / f'a{i}.png'),
                    rng.randint(0, 255, (16, 16, 3)).astype('uint8'))
        cv2.imwrite(str(root / 'ann_dir' / 'val' / f'a{i}.png'),
                    rng.randint(0, 7, (16, 16)).astype('uint8'))
    ds = build_dataset(dict(
        type='ISPRSDataset', data_root=str(root), img_dir='img_dir/val',
        ann_dir='ann_dir/val', test_mode=True,
        pipeline=[dict(type='LoadImageFromFile'),
                  dict(type='ImageToTensor', keys=['img']),
                  dict(type='Collect', keys=['img'])]))
    preds = [rng.randint(0, 6, (16, 16)) for _ in range(2)]
    files = ds.format_results(preds, str(tmp_path / 'sub'))
    assert len(files) == 2 and all(os.path.exists(f) for f in files)


def test_gaussian_blur_matches_scipy_reflect101():
    """matmul-form separable blur == scipy gaussian_filter1d 'mirror'
    (reflect-101, kornia's default border)."""
    from scipy.ndimage import gaussian_filter1d
    from pfst_tpu.models.utils.dacs_transforms import \
        gaussian_blur_single
    rs = np.random.RandomState(0)
    img = rs.rand(24, 30, 3).astype(np.float32)
    sigma = 0.8
    ours = np.asarray(gaussian_blur_single(
        jnp.asarray(img), jnp.float32(sigma), (13, 13)))
    ref = gaussian_filter1d(img, sigma, axis=0, mode='mirror',
                            truncate=6 / sigma)
    ref = gaussian_filter1d(ref, sigma, axis=1, mode='mirror',
                            truncate=6 / sigma)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ohem_thresh_with_few_valid_pixels():
    """#valid < min_kept: the threshold must come from the highest
    VALID gt-prob, not from an ignored pixel's sentinel 1.0."""
    import jax
    import jax.numpy as jnp

    from pfst_tpu.core.seg import OHEMPixelSampler

    rs = np.random.RandomState(0)
    logit = jnp.asarray(rs.randn(1, 8, 8, 4), np.float32)
    label = np.full((1, 8, 8), 255, np.int64)
    label[0, :2, :2] = rs.randint(0, 4, (2, 2))  # only 4 valid pixels
    label = jnp.asarray(label)
    sampler = OHEMPixelSampler(thresh=0.99, min_kept=100)
    w = np.asarray(sampler.sample(logit, label))
    # all 4 valid pixels kept (threshold >= their max prob), none of
    # the 60 ignored ones
    assert w.sum() == 4
    assert (w[0, :2, :2] == 1).all()

    # sanity: when plenty of pixels are valid the easy ones drop
    label2 = jnp.asarray(rs.randint(0, 4, (1, 8, 8)))
    conf = jnp.zeros((1, 8, 8, 4), np.float32).at[..., 0].set(50.0)
    label2 = jnp.zeros((1, 8, 8), jnp.int32)  # gt prob ~1 everywhere
    sampler2 = OHEMPixelSampler(thresh=0.7, min_kept=5)
    w2 = np.asarray(sampler2.sample(conf, label2))
    assert w2.sum() <= 5
