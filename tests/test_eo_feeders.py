"""EO feeder datasets (Inria / SeasonNet layouts) end-to-end."""
import os

import cv2
import numpy as np
import pytest

from pfst_tpu.datasets import build_dataset

IMG_NORM = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)


@pytest.fixture(scope='module')
def inria_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('inria')
    rs = np.random.RandomState(0)
    for split in ('train',):
        os.makedirs(root / split / 'images')
        os.makedirs(root / split / 'gt')
        for city in ('austin', 'vienna'):
            for i in range(2):
                img = rs.randint(0, 255, (64, 64, 3), np.uint8)
                gt = (rs.rand(64, 64) > 0.5).astype(np.uint8)
                cv2.imwrite(str(root / split / 'images' /
                                f'{city}{i}.png'), img)
                cv2.imwrite(str(root / split / 'gt' /
                                f'{city}{i}.png'), gt)
    return str(root)


def _pipeline(crop=32):
    return [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', reduce_zero_label=False),
        dict(type='Resize', img_scale=(48, 48), ratio_range=(0.8, 1.2)),
        dict(type='RandomCrop', crop_size=(crop, crop),
             cat_max_ratio=1.0),
        dict(type='Normalize', **IMG_NORM),
        dict(type='Pad', size=(crop, crop), pad_val=0, seg_pad_val=255),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ]


def test_inria_feeder_city_filter(inria_root):
    src = build_dataset(dict(
        type='EODataset', data_root=inria_root,
        datapipe='inria_clipped',
        datapipe_cfg=dict(city_names=['austin']), split='train',
        pipeline=_pipeline()))
    trg = build_dataset(dict(
        type='EODataset', data_root=inria_root,
        datapipe='inria_clipped',
        datapipe_cfg=dict(city_names=['vienna']), split='train',
        pipeline=_pipeline()))
    assert len(src) == 2 and len(trg) == 2
    s = src[0]
    assert s['img'].shape == (32, 32, 3)
    assert set(np.unique(s['gt_semantic_seg'])) <= {0, 1, 255}


def test_season_net_feeder(tmp_path):
    root = tmp_path / 'season'
    rs = np.random.RandomState(0)
    os.makedirs(root / 'train' / 'images')
    os.makedirs(root / 'train' / 'labels')
    for season in ('spring', 'fall'):
        for i in range(2):
            img = rs.randint(0, 4000, (32, 32, 3)).astype(np.uint16)
            lbl = rs.randint(0, 33, (32, 32)).astype(np.uint8)
            cv2.imwrite(str(root / 'train' / 'images' /
                            f'{season}_{i}.tif'), img)
            cv2.imwrite(str(root / 'train' / 'labels' /
                            f'{season}_{i}.tif'), lbl)
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', reduce_zero_label=True),
        dict(type='ClipNormalize',
             mean=[817.8, 817.9, 613.9],
             std=[1152.3, 1081.4, 1107.5], to_rgb=True, to_uint8=True),
        dict(type='PhotoMetricDistortion'),
        dict(type='Uint82Float'),
        dict(type='Pad', size=(32, 32), pad_val=0, seg_pad_val=255),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg']),
    ]
    ds = build_dataset(dict(
        type='SeasonNetDataset', data_root=str(root),
        datapipe='season_net', datapipe_cfg=dict(seasons=['spring']),
        split='train', pipeline=pipeline))
    assert len(ds) == 2
    s = ds[0]
    assert s['img'].dtype == np.float32
    assert s['img'].shape == (32, 32, 3)
    assert 0.0 <= s['img'].min() and s['img'].max() <= 255.0
