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


def test_random_crop_bincount_matches_unique_decision():
    """The uint8 bincount fast path takes the same accept/reject
    decision (and hence the same RNG stream) as np.unique."""
    rs = np.random.RandomState(3)
    t = PIPELINES.build(dict(type='RandomCrop', crop_size=(32, 32),
                             cat_max_ratio=0.75))
    for trial in range(6):
        gt8 = rs.randint(0, 4, (64, 64)).astype(np.uint8)
        gt8[gt8 == 3] = 255  # some ignore
        gt32 = gt8.astype(np.int32)  # int32 falls back to np.unique
        np.random.seed(100 + trial)
        out8 = t(_results(img=np.zeros((64, 64, 3), np.uint8),
                          gt=gt8))
        np.random.seed(100 + trial)
        out32 = t(_results(img=np.zeros((64, 64, 3), np.uint8),
                           gt=gt32))
        assert out8['crop_bbox'] == out32['crop_bbox']
        np.testing.assert_array_equal(
            out8['gt_semantic_seg'].astype(np.int32),
            out32['gt_semantic_seg'])


def test_decode_cache_roundtrip_and_eviction(tmp_path):
    import cv2
    from pfst_tpu.datasets.pipelines import loading

    paths = []
    rs = np.random.RandomState(0)
    for i in range(3):
        p = str(tmp_path / f'im{i}.png')
        cv2.imwrite(p, rs.randint(0, 255, (64, 64, 3), np.uint8))
        paths.append(p)

    loading.set_decode_cache_mb(1)
    try:
        cold = [loading.imread(p) for p in paths]
        warm = [loading.imread(p) for p in paths]
        for c, w in zip(cold, warm):
            np.testing.assert_array_equal(c, w)
            assert not w.flags.writeable  # cached copies are frozen
        cache = loading._decode_cache
        assert cache.hits == 3 and cache.misses == 3

        # a budget smaller than one tile caches nothing
        loading.set_decode_cache_mb(64 * 64 * 3 / 2 ** 21)
        _ = loading.imread(paths[0])
        _ = loading.imread(paths[0])
        assert loading._decode_cache.hits == 0

        # LRU eviction keeps total bytes under budget
        loading.set_decode_cache_mb(64 * 64 * 3 * 2 / 2 ** 20)
        for p in paths:          # 3 tiles, room for 2
            loading.imread(p)
        assert loading._decode_cache._bytes <= 64 * 64 * 3 * 2
        assert len(loading._decode_cache._items) == 2
    finally:
        loading.set_decode_cache_mb(0)


def test_decode_cache_pipeline_outputs_identical(tmp_path):
    """A full source-pipeline pass produces bit-identical samples with
    the cache on (reads are copies-on-transform, never aliased)."""
    import cv2
    from pfst_tpu.datasets.pipelines import loading
    from pfst_tpu.datasets.pipelines.compose import Compose

    img = np.random.RandomState(1).randint(
        0, 255, (96, 96, 3), np.uint8)
    gt = np.random.RandomState(2).randint(0, 6, (96, 96), np.uint8)
    ip = str(tmp_path / 'img.png')
    gp = str(tmp_path / 'gt.png')
    cv2.imwrite(ip, img)
    cv2.imwrite(gp, gt)

    pipe = Compose([
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', reduce_zero_label=True),
        dict(type='Resize', img_scale=(80, 80),
             ratio_range=(0.8, 1.2)),
        dict(type='RandomCrop', crop_size=(64, 64),
             cat_max_ratio=0.75),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='PhotoMetricDistortion'),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='Pad', size=(64, 64), pad_val=0, seg_pad_val=255),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ])

    def sample():
        data = dict(img_info=dict(filename='img.png'),
                    ann_info=dict(seg_map='gt.png'),
                    img_prefix=str(tmp_path), seg_prefix=str(tmp_path),
                    seg_fields=[])
        return pipe(data)

    np.random.seed(11)
    ref = sample()
    loading.set_decode_cache_mb(8)
    try:
        np.random.seed(11)
        warmup = sample()           # populates the cache
        np.random.seed(11)
        cached = sample()           # served from the cache
        assert loading._decode_cache.hits >= 2
        for key in ('img', 'gt_semantic_seg'):
            np.testing.assert_array_equal(ref[key], warmup[key])
            np.testing.assert_array_equal(ref[key], cached[key])
    finally:
        loading.set_decode_cache_mb(0)
