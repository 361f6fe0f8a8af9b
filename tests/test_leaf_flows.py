"""End-to-end mini runs of the non-Potsdam leaf experiment flows
(Inria EO feeder + SeasonNet uint16 pipeline) with a tiny model."""
import os

import cv2
import numpy as np
import pytest

from conftest import tiny_model_cfg
from pfst_tpu.utils.config import Config


@pytest.fixture(scope='module')
def inria_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('inria_e2e')
    rs = np.random.RandomState(0)
    os.makedirs(root / 'train' / 'images')
    os.makedirs(root / 'train' / 'gt')
    for city in ('austin', 'vienna'):
        for i in range(3):
            cv2.imwrite(str(root / 'train' / 'images' /
                            f'{city}{i}.png'),
                        rs.randint(0, 255, (48, 48, 3), np.uint8))
            cv2.imwrite(str(root / 'train' / 'gt' / f'{city}{i}.png'),
                        (rs.rand(48, 48) > 0.5).astype(np.uint8))
    return str(root)


def test_inria_uda_flow(inria_root, tmp_path):
    """UDADataset over EO feeders + PFGST step, like the inria_da
    config but tiny."""
    norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)
    crop = (32, 32)

    def pipe(target=False):
        steps = [dict(type='LoadImageFromFile')]
        if target:
            steps.append(dict(type='LoadAnnotationsPseudoLabelsV2',
                              pseudo_labels_dir=None,
                              reduce_zero_label=False,
                              load_feats=False, pseudo_ratio=0.3))
        else:
            steps.append(dict(type='LoadAnnotations',
                              reduce_zero_label=False))
        steps += [
            dict(type='Resize', img_scale=(40, 40),
                 ratio_range=(0.8, 1.2)),
            dict(type='RandomCrop', crop_size=crop, cat_max_ratio=0.75),
        ]
        if target:
            steps.append(dict(type='StrongAugmentation'))
        steps += [
            dict(type='Normalize', **norm),
            dict(type='Pad', size=crop, pad_val=0, seg_pad_val=255),
            dict(type='DefaultFormatBundle'),
            dict(type='Collect',
                 keys=(['img', 'img_strong_aug', 'gt_semantic_seg']
                       if target else ['img', 'gt_semantic_seg'])),
        ]
        return steps

    def eo(cities, target=False):
        return dict(type='EODataset', data_root=inria_root,
                    datapipe='inria_clipped',
                    datapipe_cfg=dict(city_names=cities), split='train',
                    pipeline=pipe(target))

    cfg = Config(dict(
        model=tiny_model_cfg(num_classes=2),
        data=dict(samples_per_gpu=1, workers_per_gpu=1,
                  train=dict(type='UDADataset',
                             source=eo(['austin']),
                             target=eo(['vienna'], target=True),
                             rare_class_sampling=None),
                  val=eo(['vienna']), test=eo(['vienna'])),
        uda=dict(type='PFGST', alpha=0.99, pseudo_threshold=0.9,
                 pseudo_weight_ignore_top=0,
                 pseudo_weight_ignore_bottom=0,
                 imnet_feature_dist_lambda=0, mix='class', blur=False,
                 color_jitter_strength=0.2, color_jitter_probability=0.2,
                 print_grad_magnitude=False, thre_type='all',
                 use_decoded_feats=True,
                 aux_losses=[dict(
                     type='PFGSTLoss', kernel_size=3, dilation=1,
                     top_k=3,
                     weights={'src_pos': 0.1, 'src_neg': 0.1,
                              'sim_pos': 0.1, 'sim_neg': 0.1,
                              'src_pos_std': 0.1, 'src_neg_std': 0.1},
                     sim_type='cosine', feat_level=None,
                     detach_unfold=True, downscale=0.5)]),
        optimizer=dict(type='AdamW', lr=1e-3, weight_decay=0.01),
        optimizer_config=None,
        lr_config=dict(policy='poly', warmup='linear', warmup_iters=2,
                       warmup_ratio=1e-6, power=1.0, min_lr=0.0),
        runner=dict(type='IterBasedRunner', max_iters=2),
        checkpoint_config=dict(interval=100),
        evaluation=dict(interval=100),
        log_config=dict(interval=1)))
    from pfst_tpu.apis import train_segmentor
    state = train_segmentor(cfg, work_dir=None, validate=False, seed=0)
    assert int(state.step) == 2


def test_season_net_flow(tmp_path):
    """SeasonNet-style uint16 ClipNormalize pipeline through the
    UDADatasetV2 random pairing + supervised step."""
    root = tmp_path / 'season'
    rs = np.random.RandomState(0)
    os.makedirs(root / 'train' / 'images')
    os.makedirs(root / 'train' / 'labels')
    for season in ('spring', 'fall'):
        for i in range(3):
            cv2.imwrite(str(root / 'train' / 'images' /
                            f'{season}_{i}.tif'),
                        rs.randint(0, 4000,
                                   (40, 40, 3)).astype(np.uint16))
            cv2.imwrite(str(root / 'train' / 'labels' /
                            f'{season}_{i}.tif'),
                        rs.randint(0, 8, (40, 40)).astype(np.uint8))
    norm = dict(mean=[817.8, 817.9, 613.9],
                std=[1152.3, 1081.4, 1107.5], to_rgb=True,
                to_uint8=True)
    crop = (32, 32)

    def pipe(target=False):
        steps = [dict(type='LoadImageFromFile')]
        if target:
            steps.append(dict(type='LoadAnnotationsPseudoLabelsV2',
                              pseudo_labels_dir=None,
                              reduce_zero_label=False,
                              pseudo_ratio=0.3))
        else:
            steps.append(dict(type='LoadAnnotations',
                              reduce_zero_label=True))
        steps += [
            dict(type='ClipNormalize', **norm),
            dict(type='Resize', img_scale=(36, 36),
                 ratio_range=(0.9, 1.1)),
            dict(type='RandomCrop', crop_size=crop, cat_max_ratio=0.75),
            dict(type='PhotoMetricDistortion'),
        ]
        if target:
            steps.append(dict(type='StrongAugmentation'))
        steps += [
            dict(type='Uint82Float'),
            dict(type='Pad', size=crop, pad_val=0, seg_pad_val=255),
            dict(type='DefaultFormatBundle'),
            dict(type='Collect',
                 keys=(['img', 'img_strong_aug', 'gt_semantic_seg']
                       if target else ['img', 'gt_semantic_seg'])),
        ]
        return steps

    def sn(seasons, target=False):
        return dict(type='SeasonNetDataset', data_root=str(root),
                    datapipe='season_net',
                    datapipe_cfg=dict(seasons=seasons), split='train',
                    pipeline=pipe(target))

    from pfst_tpu.datasets import build_dataset
    ds = build_dataset(dict(type='UDADatasetV2', source=sn(['spring']),
                            target=sn(['fall'], target=True),
                            rare_class_sampling=None))
    assert len(ds) == 3  # V2: len == len(source)
    s = ds[0]
    assert s['img'].shape == (32, 32, 3)
    assert s['target_img_strong_aug'].shape == (32, 32, 3)
