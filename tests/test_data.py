"""Data layer tests: pipelines, datasets, UDA pairing, dataloader."""
import os
import os.path as osp
import time

import cv2
import numpy as np
import pytest

from pfst_tpu.datasets import (DataLoader, UDADataset, build_dataloader,
                               build_dataset)

IMG_NORM = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)
CROP = (64, 64)

SOURCE_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', reduce_zero_label=True),
    dict(type='Resize', img_scale=(72, 72), ratio_range=(0.5, 2.0)),
    dict(type='RandomCrop', crop_size=CROP, cat_max_ratio=0.75),
    dict(type='RandomRotate90', prob=1.0),
    dict(type='RandomFlip', flip_ratio=0.5, direction='vertical'),
    dict(type='RandomFlip', flip_ratio=0.5, direction='horizontal'),
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize', **IMG_NORM),
    dict(type='Pad', size=CROP, pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]

TARGET_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotationsPseudoLabelsV2', pseudo_labels_dir=None,
         reduce_zero_label=False, load_feats=False, pseudo_ratio=0.0),
    dict(type='Resize', img_scale=(96, 96), ratio_range=(0.5, 2.0)),
    dict(type='RandomCrop', crop_size=CROP, cat_max_ratio=0.75),
    dict(type='RandomRotate90', prob=1.0),
    dict(type='RandomFlip', flip_ratio=0.5, direction='vertical'),
    dict(type='RandomFlip', flip_ratio=0.5, direction='horizontal'),
    dict(type='StrongAugmentation'),
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize', **IMG_NORM),
    dict(type='Pad', size=CROP, pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'img_strong_aug',
                               'gt_semantic_seg']),
]


@pytest.fixture(scope='module')
def isprs_root(tmp_path_factory):
    """Tiny ISPRS-layout dataset: 4 train images, 2 val."""
    root = tmp_path_factory.mktemp('isprs')
    rs = np.random.RandomState(0)
    for split, n in [('train', 4), ('val', 2)]:
        os.makedirs(root / 'img_dir' / split)
        os.makedirs(root / 'ann_dir' / split)
        for i in range(n):
            img = rs.randint(0, 255, (80, 80, 3), np.uint8)
            # labels 0..6 where 0 = boundary (ignored by reduce_zero)
            ann = rs.randint(0, 7, (80, 80)).astype(np.uint8)
            cv2.imwrite(str(root / 'img_dir' / split / f'p{i}.png'), img)
            cv2.imwrite(str(root / 'ann_dir' / split / f'p{i}.png'), ann)
    return str(root)


def _source_cfg(root, pipeline):
    return dict(type='ISPRSDataset', data_root=root,
                img_dir='img_dir/train', ann_dir='ann_dir/train',
                gt_seg_map_loader_cfg=dict(reduce_zero_label=True),
                pipeline=pipeline)


def test_source_pipeline_shapes(isprs_root):
    ds = build_dataset(_source_cfg(isprs_root, SOURCE_PIPELINE))
    assert len(ds) == 4
    s = ds[0]
    assert s['img'].shape == (64, 64, 3)
    assert s['img'].dtype == np.float32
    assert s['gt_semantic_seg'].shape == (64, 64)
    # reduce_zero_label: 0 -> 255, valid in [0, 5] or 255
    gt = s['gt_semantic_seg']
    assert set(np.unique(gt)) <= set(range(6)) | {255}
    assert 'rotate_k' in s['img_metas']
    assert 'crop_bbox' in s['img_metas']


def test_uda_dataset_pairing(isprs_root):
    cfg = dict(type='UDADataset',
               source=_source_cfg(isprs_root, SOURCE_PIPELINE),
               target=_source_cfg(isprs_root, TARGET_PIPELINE),
               rare_class_sampling=None)
    # target pipeline replaces annotations with dummy 255 labels
    cfg['target']['pipeline'] = TARGET_PIPELINE
    ds = build_dataset(cfg)
    assert len(ds) == 16
    s = ds[5]
    assert s['img'].shape == (64, 64, 3)
    assert s['target_img'].shape == (64, 64, 3)
    assert s['target_img_strong_aug'].shape == (64, 64, 3)
    # strong aug really differs from the weak view somewhere
    assert not np.allclose(s['target_img'], s['target_img_strong_aug'])


def test_dataloader_batches(isprs_root):
    cfg = dict(type='UDADataset',
               source=_source_cfg(isprs_root, SOURCE_PIPELINE),
               target=_source_cfg(isprs_root, TARGET_PIPELINE),
               rare_class_sampling=None)
    ds = build_dataset(cfg)
    loader = DataLoader(ds, samples_per_gpu=2, workers_per_gpu=1,
                        shuffle=True, seed=0, drop_last=True)
    batch = next(iter(loader))
    assert batch['img'].shape == (2, 64, 64, 3)
    assert batch['target_img'].shape == (2, 64, 64, 3)
    assert batch['gt_semantic_seg'].shape == (2, 64, 64)
    assert isinstance(batch['img_metas'], list)


def test_dataloader_sharding(isprs_root):
    ds = build_dataset(_source_cfg(isprs_root, SOURCE_PIPELINE))
    l0 = DataLoader(ds, 1, 1, shuffle=False, rank=0, world_size=2)
    l1 = DataLoader(ds, 1, 1, shuffle=False, rank=1, world_size=2)
    i0 = [b['img_metas'][0]['ori_filename'] for b in l0]
    i1 = [b['img_metas'][0]['ori_filename'] for b in l1]
    assert set(i0).isdisjoint(i1)
    assert len(i0) + len(i1) == 4


def test_dataloader_process_workers_match_threads(isprs_root):
    """use_processes=True (forked worker pool, the reference's
    multiprocess DataLoader role) must yield the same batches as the
    default thread pool for a deterministic pipeline."""
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', reduce_zero_label=True),
        dict(type='Normalize', **IMG_NORM),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ]
    ds = build_dataset(_source_cfg(isprs_root, pipeline))
    lt = DataLoader(ds, 2, 2, shuffle=True, seed=3, drop_last=True)
    lp = DataLoader(ds, 2, 2, shuffle=True, seed=3, drop_last=True,
                    use_processes=True)
    bt = list(lt)
    bp = list(lp)
    assert len(bt) == len(bp) == 2
    for a, b in zip(bt, bp):
        np.testing.assert_array_equal(a['img'], b['img'])
        np.testing.assert_array_equal(a['gt_semantic_seg'],
                                      b['gt_semantic_seg'])


def test_dataloader_sharding_world8(tmp_path):
    """Multi-host loader contract at world_size=8 (the reference's
    DistributedSampler semantics): per-rank subsets are disjoint, have
    equal size, and together cover the full dataset exactly once per
    epoch — with and without shuffling."""
    root = tmp_path / 'mini16'
    rs = np.random.RandomState(2)
    os.makedirs(root / 'img_dir' / 'train')
    os.makedirs(root / 'ann_dir' / 'train')
    for i in range(16):
        cv2.imwrite(str(root / 'img_dir' / 'train' / f'p{i:02d}.png'),
                    rs.randint(0, 255, (80, 80, 3), np.uint8))
        cv2.imwrite(str(root / 'ann_dir' / 'train' / f'p{i:02d}.png'),
                    rs.randint(0, 7, (80, 80)).astype(np.uint8))
    ds = build_dataset(_source_cfg(str(root), SOURCE_PIPELINE))
    for shuffle in (False, True):
        per_rank = []
        for r in range(8):
            loader = DataLoader(ds, 1, 1, shuffle=shuffle, seed=0,
                                rank=r, world_size=8)
            per_rank.append(
                [b['img_metas'][0]['ori_filename'] for b in loader])
        assert all(len(fs) == 2 for fs in per_rank)
        flat = [f for fs in per_rank for f in fs]
        assert len(set(flat)) == 16, 'ranks must cover every image'
        for a in range(8):
            for b in range(a + 1, 8):
                assert set(per_rank[a]).isdisjoint(per_rank[b])


def test_test_pipeline_and_pre_eval(isprs_root):
    test_pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(96, 96), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='Normalize', **IMG_NORM),
                 dict(type='ImageToTensor', keys=['img']),
                 dict(type='Collect', keys=['img']),
             ])
    ]
    ds = build_dataset(dict(
        type='ISPRSDataset', data_root=isprs_root, img_dir='img_dir/val',
        ann_dir='ann_dir/val',
        gt_seg_map_loader_cfg=dict(reduce_zero_label=True),
        pipeline=test_pipeline, test_mode=True))
    s = ds[0]
    assert isinstance(s['img'], list)
    gt = ds.get_gt_seg_map_by_idx(0)
    pred = np.zeros_like(gt)
    pre = ds.pre_eval(pred, 0)
    res = ds.evaluate(pre, metric='mIoU')
    assert 'mIoU' in res and 0.0 <= res['mIoU'] <= 1.0


# ratio_range floor keeps resized >= crop: with images smaller than
# the crop, Pad (after rot/flip) fills different corners of img vs the
# pre-rotation snapshot and exact replay is impossible (the shipped
# 512^2 pipelines are always in this no-pad regime).
ORI_TARGET_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotationsPseudoLabelsV2', pseudo_labels_dir=None,
         reduce_zero_label=False, load_feats=False, pseudo_ratio=0.0),
    dict(type='Resize', img_scale=(96, 96), ratio_range=(0.8, 1.2)),
    dict(type='RandomCrop', crop_size=CROP, cat_max_ratio=0.75),
    dict(type='KeepOriImage'),
    dict(type='RandomRotate90', prob=1.0),
    dict(type='RandomFlip', flip_ratio=0.5, direction='vertical'),
    dict(type='RandomFlip', flip_ratio=0.5, direction='horizontal'),
    dict(type='StrongAugmentation'),
    dict(type='Normalize', **IMG_NORM),
    dict(type='Pad', size=CROP, pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'img_strong_aug', 'ori_img',
                               'rotate_k', 'flip_vertical',
                               'flip_horizontal', 'gt_semantic_seg']),
]


def test_keep_ori_image_replay_invariant(isprs_root):
    """PFSTV4 wiring: replaying the clean snapshot with the recorded
    rot/flip metas must reproduce the augmented target view exactly
    (geometry only; photometric distortion stays on img_strong_aug)."""
    import jax.numpy as jnp

    from pfst_tpu.models.utils.pfst_transforms import transform_by_metas

    cfg = dict(type='UDADataset',
               source=_source_cfg(isprs_root, SOURCE_PIPELINE),
               target=_source_cfg(isprs_root, ORI_TARGET_PIPELINE),
               rare_class_sampling=None)
    np.random.seed(0)
    loader = DataLoader(build_dataset(cfg), samples_per_gpu=2,
                        workers_per_gpu=1, seed=0)
    b = next(iter(loader))
    assert b['target_img_ori'].shape == b['target_img'].shape
    assert b['rotate_k'].shape == (2,)
    assert b['rotate_k'].dtype == np.int32
    out = transform_by_metas(
        jnp.asarray(b['target_img_ori']),
        {k: b[k] for k in ('rotate_k', 'flip_vertical',
                           'flip_horizontal')})
    np.testing.assert_array_equal(np.asarray(out), b['target_img'])


def test_multi_domain_dataset_prefixes(isprs_root):
    """MultiDomainDataset: one sample per domain, dom{i}_ prefixed
    keys (dataset_wrappers.py:262-287) — the DomainAdaptor input."""
    cfg = dict(type='MultiDomainDataset', datasets=[
        _source_cfg(isprs_root, SOURCE_PIPELINE),
        _source_cfg(isprs_root, SOURCE_PIPELINE),
    ])
    ds = build_dataset(cfg)
    assert len(ds) == 4
    s = ds[1]
    assert s['dom1_img'].shape == (64, 64, 3)
    assert s['dom2_img'].shape == (64, 64, 3)
    assert 'dom1_gt_semantic_seg' in s and 'dom2_gt_semantic_seg' in s


def test_dataloader_zero_batch_guard(isprs_root):
    """drop_last + per-rank shard < batch_size must raise instead of
    spinning forever in infinite mode."""
    ds = build_dataset(_source_cfg(isprs_root, SOURCE_PIPELINE))
    loader = DataLoader(ds, samples_per_gpu=16, workers_per_gpu=1,
                        seed=0, drop_last=True, infinite=True)
    with pytest.raises(ValueError, match='0 batches'):
        next(iter(loader))


def test_dataloader_propagates_pipeline_errors():
    """A failing sample must raise in the consumer, not silently
    truncate the epoch (which would hang the infinite train loader)."""
    from pfst_tpu.datasets.builder import DataLoader

    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise FileNotFoundError(f'corrupt sample {i}')
            return {'img': np.zeros((4, 4, 3), np.float32)}

    loader = DataLoader(Broken(), samples_per_gpu=2,
                        workers_per_gpu=1, shuffle=False)
    with pytest.raises(FileNotFoundError, match='corrupt sample'):
        for _ in loader:
            pass


def test_dataloader_abandoned_iteration_does_not_leak_producer():
    """Breaking out mid-epoch must unblock the producer thread."""
    import threading

    from pfst_tpu.datasets.builder import DataLoader

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {'img': np.zeros((4, 4, 3), np.float32)}

    loader = DataLoader(DS(), samples_per_gpu=2, workers_per_gpu=1,
                        shuffle=False)
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # abandon mid-epoch
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before + 1


def test_tta_ratio_mode_without_img_scale():
    """MultiScaleFlipAug(img_scale=None, img_ratios=...) derives pixel
    scales from the image shape (mmseg scale_factor mode)."""
    from pfst_tpu.datasets.pipelines import Compose

    pipeline = Compose([
        dict(type='MultiScaleFlipAug', img_scale=None,
             img_ratios=[0.5, 1.0], flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='ImageToTensor', keys=['img']),
                 dict(type='Collect', keys=['img']),
             ])
    ])
    img = np.random.RandomState(0).randint(
        0, 255, (32, 48, 3), np.uint8)
    out = pipeline(dict(img=img, img_shape=img.shape,
                        ori_shape=img.shape, img_fields=['img'],
                        seg_fields=[], filename=None,
                        ori_filename=None))
    shapes = [tuple(v.shape[:2]) for v in out['img']]
    assert shapes == [(16, 24), (32, 48)], shapes


def test_dataloader_set_position_resumes_stream():
    """set_position(k) makes the next batch equal batch k of an
    uninterrupted run — across epoch boundaries and with shuffling —
    so checkpoint resume continues the exact data stream instead of
    replaying the epoch (apis/train.py resume path)."""
    from pfst_tpu.datasets.builder import DataLoader

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {'x': np.asarray([i], np.int64)}

    def stream(n, skip=None):
        loader = DataLoader(DS(), samples_per_gpu=2, workers_per_gpu=1,
                            shuffle=True, seed=5, infinite=True)
        if skip is not None:
            loader.set_position(skip)
        it = iter(loader)
        out = [tuple(next(it)['x'].ravel()) for _ in range(n)]
        it.close()
        return out

    full = stream(12)                      # 2.4 epochs of 5 batches
    assert stream(8, skip=4) == full[4:]   # resume within epoch 0
    assert stream(5, skip=7) == full[7:]   # resume inside epoch 1
    assert stream(2, skip=10) == full[10:]  # resume at epoch boundary
    # shuffling is real: epochs see different permutations
    assert full[:5] != full[5:10]
