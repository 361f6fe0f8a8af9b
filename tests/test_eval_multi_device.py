"""multi_gpu_test: device-sharded eval must match single_gpu_test
bit-for-bit while splitting the forward batches across devices
(reference ``rsiseg/apis/test.py:194-287``)."""
import os

import cv2
import jax
import numpy as np
import pytest

from conftest import tiny_model_cfg

IMG_NORM = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)


@pytest.fixture(scope='module')
def eval_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp('eval_mini')
    rs = np.random.RandomState(7)
    os.makedirs(root / 'img_dir' / 'val')
    os.makedirs(root / 'ann_dir' / 'val')
    for i in range(8):
        img = rs.randint(0, 255, (40, 40, 3), np.uint8)
        ann = rs.randint(0, 7, (40, 40)).astype(np.uint8)
        cv2.imwrite(str(root / 'img_dir' / 'val' / f'x{i}.png'), img)
        cv2.imwrite(str(root / 'ann_dir' / 'val' / f'x{i}.png'), ann)

    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(40, 40), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='Normalize', **IMG_NORM),
                 dict(type='ImageToTensor', keys=['img']),
                 dict(type='Collect', keys=['img']),
             ])
    ]
    from pfst_tpu.datasets import build_dataloader, build_dataset
    ds = build_dataset(dict(
        type='ISPRSDataset', data_root=str(root), img_dir='img_dir/val',
        ann_dir='ann_dir/val',
        gt_seg_map_loader_cfg=dict(reduce_zero_label=True),
        pipeline=pipeline, test_mode=True))
    loader = build_dataloader(ds, 1, 1, shuffle=False)

    from pfst_tpu.models import build_segmentor
    model = build_segmentor(tiny_model_cfg())
    import jax.numpy as jnp
    variables = jax.jit(
        lambda r, im: model.init({'params': r}, im, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 40, 40, 3)))
    return model, variables, loader, ds


def test_multi_device_eval_matches_single(eval_setup):
    model, variables, loader, ds = eval_setup
    from pfst_tpu.apis import multi_gpu_test, single_gpu_test

    res_single = single_gpu_test(model, variables, loader,
                                 pre_eval=True, progress=False)
    res_multi = multi_gpu_test(model, variables, loader,
                               pre_eval=True, progress=False)
    assert len(res_single) == len(res_multi) == 8
    # identical per-image (intersect, union, pred, label) histograms
    for a, b in zip(res_single, res_multi):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    m_single = ds.evaluate(res_single, metric='mIoU')
    m_multi = ds.evaluate(res_multi, metric='mIoU')
    assert m_single['mIoU'] == m_multi['mIoU']
    # 8 images over 8 devices -> ONE sharded device batch (vs 8
    # per-image forwards on the single path)
    assert multi_gpu_test.last_num_device_batches == 1


def test_multi_device_eval_histograms_on_device(eval_setup,
                                                monkeypatch):
    """For plain single-view eval the (intersect, union) histograms
    are computed inside the sharded program — host pre_eval is never
    invoked (SURVEY §5 eval-reduction design)."""
    model, variables, loader, ds = eval_setup
    from pfst_tpu.apis import multi_gpu_test

    def boom(*a, **k):
        raise AssertionError('host pre_eval must not run')

    monkeypatch.setattr(ds, 'pre_eval', boom)
    res = multi_gpu_test(model, variables, loader, pre_eval=True,
                         progress=False)
    assert len(res) == 8
    m = ds.evaluate(res, metric='mIoU')
    assert np.isfinite(m['mIoU'])


def test_multi_device_eval_partial_bucket(eval_setup):
    """Non-multiple-of-n_devices image counts pad the last batch."""
    model, variables, loader, ds = eval_setup
    from pfst_tpu.apis import multi_gpu_test, single_gpu_test

    class _Trunc:
        def __init__(self, ds, n):
            self.dataset = _TruncDS(ds, n)

    class _TruncDS:
        def __init__(self, ds, n):
            self._ds, self._n = ds, n
            self.pre_eval = ds.pre_eval

        def __len__(self):
            return self._n

        def __getitem__(self, i):
            return self._ds[i]

    tl = _Trunc(loader.dataset, 3)
    res_multi = multi_gpu_test(model, variables, tl, pre_eval=True,
                               progress=False)
    res_single = single_gpu_test(model, variables, tl, pre_eval=True,
                                 progress=False)
    assert len(res_multi) == len(res_single) == 3
    for a, b in zip(res_single, res_multi):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_spatial_eval_matches_single(eval_setup):
    """single_gpu_test(spatial=8): each 40-high image's forward runs
    H-sharded over the 8-device mesh (divisible — no padding) and the
    per-image histograms must match the unsharded eval."""
    model, variables, loader, ds = eval_setup
    from pfst_tpu.apis import single_gpu_test

    res_plain = single_gpu_test(model, variables, loader,
                                pre_eval=True, progress=False)
    res_sp = single_gpu_test(model, variables, loader, pre_eval=True,
                             progress=False, spatial=8)
    assert len(res_sp) == len(res_plain) == 8
    m_plain = ds.evaluate(res_plain, metric='mIoU')
    m_sp = ds.evaluate(res_sp, metric='mIoU')
    # layout-only sharding: identical math modulo fp reassociation;
    # allow a whisker of argmax-tie noise on the random-init model
    assert abs(m_plain['mIoU'] - m_sp['mIoU']) < 0.2


def test_spatial_eval_pads_nondivisible(eval_setup):
    """spatial=3 on 40-high images: H pads 40->42 with edge rows and
    the probs crop back — semantics identical to padding by hand and
    running unsharded."""
    import jax.numpy as jnp

    model, variables, loader, ds = eval_setup
    from pfst_tpu.apis.test import (make_inference_fn,
                                    make_spatial_inference_fn)

    img = jnp.asarray(
        np.random.RandomState(3).randn(1, 40, 40, 3), np.float32)
    sp_fn = make_spatial_inference_fn(model, 3)
    out_sp = np.asarray(sp_fn(variables, img))
    assert out_sp.shape[1] == 40  # cropped back

    padded = jnp.pad(img, ((0, 0), (0, 2), (0, 0), (0, 0)),
                     mode='edge')
    ref = np.asarray(
        make_inference_fn(model)(variables, padded))[:, :40]
    np.testing.assert_allclose(out_sp, ref, atol=1e-5)


def test_single_gpu_eval_deferred_uint8_wire(tmp_path):
    """tools/test.py --device-normalize: the eval pipeline ships
    uint8 wire images (metas carry ``img_norm_cfg.deferred``) and
    single_gpu_test normalizes on device — results match the
    host-normalized pipeline on integer-valued inputs (allowing a
    few tie pixels: XLA may fuse (x-mean)/std differently than
    numpy)."""
    import copy

    import cv2
    import jax.numpy as jnp

    from pfst_tpu.apis import single_gpu_test
    from pfst_tpu.datasets import build_dataloader, build_dataset
    from pfst_tpu.datasets.pipelines import DeferNormalize
    from pfst_tpu.models import build_segmentor

    root = tmp_path / 'eval_wire'
    rs = np.random.RandomState(11)
    os.makedirs(root / 'img_dir' / 'val')
    os.makedirs(root / 'ann_dir' / 'val')
    for i in range(4):
        cv2.imwrite(str(root / 'img_dir' / 'val' / f'x{i}.png'),
                    rs.randint(0, 255, (40, 40, 3), np.uint8))
        cv2.imwrite(str(root / 'ann_dir' / 'val' / f'x{i}.png'),
                    rs.randint(0, 7, (40, 40)).astype(np.uint8))
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(40, 40), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='Normalize', **IMG_NORM),
                 dict(type='ImageToTensor', keys=['img']),
                 dict(type='Collect', keys=['img']),
             ])
    ]
    wire_pipeline = copy.deepcopy(pipeline)
    assert DeferNormalize.swap_into(wire_pipeline, 'uint8') is not None

    def run(pipe):
        ds = build_dataset(dict(
            type='ISPRSDataset', data_root=str(root),
            img_dir='img_dir/val', ann_dir='ann_dir/val',
            gt_seg_map_loader_cfg=dict(reduce_zero_label=True),
            pipeline=pipe, test_mode=True))
        loader = build_dataloader(ds, 1, 1, shuffle=False)
        # the wire dtype must actually reach the sample
        s = ds[0]
        img0 = s['img'][0] if isinstance(s['img'], list) else s['img']
        model = build_segmentor(tiny_model_cfg())
        variables = jax.jit(
            lambda r, im: model.init({'params': r}, im,
                                     train=False))(
                jax.random.PRNGKey(0), jnp.zeros((1, 40, 40, 3)))
        res = single_gpu_test(model, variables, loader, pre_eval=True,
                              progress=False)
        return img0.dtype, res, ds, model, variables, loader

    dt_host, res_host, ds_h, _, _, _ = run(pipeline)
    dt_wire, res_wire, ds_w, model_w, vars_w, loader_w = \
        run(wire_pipeline)
    assert dt_host == np.float32
    assert dt_wire == np.uint8

    def hist_close(res_a, res_b, what):
        for a, b in zip(res_a, res_b):
            for x, y in zip(a, b):
                diff = int(np.abs(np.asarray(x, np.int64)
                                  - np.asarray(y, np.int64)).sum())
                assert diff <= 6, f'{what}: histograms differ ' \
                                  f'by {diff} pixels'

    hist_close(res_host, res_wire, 'single-device wire')
    m_h = ds_h.evaluate(res_host, metric='mIoU')['mIoU']
    m_w = ds_w.evaluate(res_wire, metric='mIoU')['mIoU']
    assert abs(m_h - m_w) < 0.005, (m_h, m_w)

    # the sharded path normalizes the wire batch inside the mesh
    # program (multi_gpu_test._wire_norm)
    from pfst_tpu.apis import multi_gpu_test
    res_multi = multi_gpu_test(model_w, vars_w, loader_w,
                               pre_eval=True, progress=False)
    hist_close(res_host, res_multi, 'multi-device wire')

    # and the in-train evaluator's opt-in config key wires through
    from pfst_tpu.apis.train import (SupervisedTrainer,
                                     evaluate_during_train)
    from pfst_tpu.utils.config import Config
    import optax
    ds_cfg = dict(
        type='ISPRSDataset', data_root=str(root),
        img_dir='img_dir/val', ann_dir='ann_dir/val',
        gt_seg_map_loader_cfg=dict(reduce_zero_label=True),
        pipeline=copy.deepcopy(pipeline))
    cfg = Config(dict(
        data=dict(device_normalize_eval='uint8', val=ds_cfg),
        evaluation=dict(metric='mIoU', pre_eval=True)))
    algo = SupervisedTrainer(build_segmentor(tiny_model_cfg()))
    state = algo.init_state(jax.random.PRNGKey(0), (1, 40, 40, 3),
                            optax.sgd(0.1))
    m_train_eval = evaluate_during_train(
        cfg, algo, state, cfg.evaluation, None)['mIoU']
    assert abs(m_train_eval - m_h) < 0.005, (m_train_eval, m_h)
