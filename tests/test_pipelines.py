"""Transform-level semantics tests (mirror of the reference's
``tests/test_data/test_transforms.py`` taxonomy)."""
import numpy as np
import pytest

from pfst_tpu.datasets.builder import PIPELINES


def _results(img=None, gt=None):
    img = img if img is not None else \
        np.random.RandomState(0).randint(0, 255, (40, 60, 3), np.uint8)
    r = dict(img=img, img_shape=img.shape, ori_shape=img.shape,
             pad_shape=img.shape, scale_factor=1.0,
             img_fields=['img'], seg_fields=[])
    if gt is not None:
        r['gt_semantic_seg'] = gt
        r['seg_fields'] = ['gt_semantic_seg']
    return r


def test_resize_keep_ratio_fits_within_scale():
    t = PIPELINES.build(dict(type='Resize', img_scale=(100, 50),
                             keep_ratio=True))
    out = t(_results())
    h, w = out['img'].shape[:2]
    assert max(h, w) <= 100 and min(h, w) <= 50
    # aspect preserved
    np.testing.assert_allclose(w / h, 60 / 40, rtol=0.05)


def test_resize_ratio_range_bounds():
    t = PIPELINES.build(dict(type='Resize', img_scale=(60, 60),
                             ratio_range=(0.5, 2.0)))
    for _ in range(5):
        out = t(_results())
        h, w = out['img'].shape[:2]
        assert 20 <= max(h, w) <= 120
        del out['img']  # fresh dict per call
    # labels track the image size with nearest interpolation
    gt = np.random.RandomState(1).randint(0, 5, (40, 60)).astype(
        np.uint8)
    out = t(_results(gt=gt))
    assert out['gt_semantic_seg'].shape == out['img'].shape[:2]


def test_random_crop_cat_max_ratio():
    gt = np.zeros((64, 64), np.uint8)
    gt[:, :24] = 1  # minority class wide enough that a mixed 32^2
    # window can go below the 0.75 cap
    t = PIPELINES.build(dict(type='RandomCrop', crop_size=(32, 32),
                             cat_max_ratio=0.75))
    hits = 0
    for i in range(10):
        np.random.seed(i)
        out = t(_results(img=np.zeros((64, 64, 3), np.uint8), gt=gt))
        counts = np.bincount(out['gt_semantic_seg'].reshape(-1),
                             minlength=2)
        if counts.max() / counts.sum() < 0.75:
            hits += 1
    assert hits >= 5  # re-crop loop usually finds a mixed window


def test_pad_semantics():
    t = PIPELINES.build(dict(type='Pad', size=(64, 64), pad_val=0,
                             seg_pad_val=255))
    gt = np.ones((40, 60), np.uint8)
    out = t(_results(gt=gt))
    assert out['img'].shape == (64, 64, 3)
    assert out['gt_semantic_seg'].shape == (64, 64)
    assert (out['gt_semantic_seg'][40:, :] == 255).all()
    assert (out['img'][40:, :, :] == 0).all()


def test_clip_normalize_reference_formula():
    mean = np.array([100.0, 100.0, 100.0])
    std = np.array([50.0, 50.0, 50.0])
    t = PIPELINES.build(dict(type='ClipNormalize', mean=mean.tolist(),
                             std=std.tolist(), to_rgb=False,
                             to_uint8=True))
    img = np.array([[[0, 100, 300]]], np.float32).repeat(3, axis=2)
    img = np.tile(np.array([0, 100, 300], np.float32).reshape(1, 1, 3),
                  (2, 2, 1))
    out = t(_results(img=img))['img']
    # (x - (mean-2std)) / 4std clipped to [0,1] then *255
    assert out.dtype == np.uint8
    assert out[0, 0, 0] == 0          # 0 -> clipped at lower bound
    assert out[0, 0, 1] == 127        # 100 -> 0.5 -> 127
    assert out[0, 0, 2] == 255        # 300 -> clipped at upper bound


def test_photometric_distortion_stays_uint8():
    t = PIPELINES.build(dict(type='PhotoMetricDistortion'))
    np.random.seed(0)
    out = t(_results())
    assert out['img'].dtype == np.uint8


def test_strong_augmentation_adds_second_view():
    t = PIPELINES.build(dict(type='StrongAugmentation'))
    np.random.seed(3)
    out = t(_results())
    assert 'img_strong_aug' in out
    assert out['img_strong_aug'].shape == out['img'].shape
    assert 'img_strong_aug' in out['img_fields']


def test_random_rotate90_records_k():
    t = PIPELINES.build(dict(type='RandomRotate90', prob=1.0))
    np.random.seed(0)
    out = t(_results())
    assert out['rotate_k'] in (0, 1, 2, 3)


def test_rerange_and_rgb2gray():
    t = PIPELINES.build(dict(type='Rerange', min_value=0,
                             max_value=1))
    out = t(_results())
    assert 0.0 <= out['img'].min() and out['img'].max() <= 1.0
    g = PIPELINES.build(dict(type='RGB2Gray'))
    out = g(_results())
    assert out['img'].shape[2] == 3
    assert np.allclose(out['img'][..., 0], out['img'][..., 1])
