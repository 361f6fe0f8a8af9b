# SeasonNet spring -> fall adaptation (33 classes, 128^2 uint16 RGB
# TIFF patches). Mirrors
# /root/reference/configs/_base_/datasets/season_net_sp2fa.py; the
# 'season_net' feeder replaces the Dataset4EO datapipe.
dataset_type = 'SeasonNetDataset'
datapipe = 'season_net'
data_root = 'data/SeasonNet'
reduce_zero_label = True
gt_seg_map_loader_cfg = dict(reduce_zero_label=reduce_zero_label)

img_norm_cfg = dict(
    mean=[817.83099309, 817.90637517, 613.89910777],
    std=[1152.3451639, 1081.4451218, 1107.54732507],
    to_rgb=True,
    to_uint8=True)

crop_size = (128, 128)
source_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', reduce_zero_label=reduce_zero_label),
    dict(type='ClipNormalize', **img_norm_cfg),
    dict(type='Resize', img_scale=(120, 120), ratio_range=(0.5, 2.0)),
    dict(type='RandomCrop', crop_size=crop_size, cat_max_ratio=0.75),
    dict(type='RandomRotate90', prob=1.0),
    dict(type='RandomFlip', flip_ratio=0.5, direction='vertical'),
    dict(type='RandomFlip', flip_ratio=0.5, direction='horizontal'),
    dict(type='PhotoMetricDistortion'),
    dict(type='Uint82Float'),
    dict(type='Pad', size=crop_size, pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]
target_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotationsPseudoLabelsV2',
         pseudo_labels_dir=None,
         load_feats=False,
         reduce_zero_label=False,
         pseudo_ratio=0.3),
    dict(type='ClipNormalize', **img_norm_cfg),
    dict(type='Resize', img_scale=(120, 120), ratio_range=(0.5, 2.0)),
    dict(type='RandomCrop', crop_size=crop_size, cat_max_ratio=0.75),
    dict(type='RandomRotate90', prob=1.0),
    dict(type='RandomFlip', flip_ratio=0.5, direction='vertical'),
    dict(type='RandomFlip', flip_ratio=0.5, direction='horizontal'),
    dict(type='PhotoMetricDistortion'),
    dict(type='StrongAugmentation'),
    dict(type='Uint82Float'),
    dict(type='Pad', size=crop_size, pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'img_strong_aug',
                               'gt_semantic_seg']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='ClipNormalize', **img_norm_cfg),
    dict(type='Uint82Float'),
    dict(
        type='MultiScaleFlipAug',
        img_scale=(128, 128),
        flip=False,
        transforms=[
            dict(type='Resize', keep_ratio=True),
            dict(type='ImageToTensor', keys=['img']),
            dict(type='Collect', keys=['img']),
        ])
]

data = dict(
    # NOTE: this EO pipeline uses ClipNormalize (no 'Normalize'), so
    # the flag defers nothing for images here — its only effect is
    # shipping LABELS as uint8; kept for uniformity with the other
    # UDA configs (PERF.md r5)
    device_normalize='uint8',
    samples_per_gpu=16,
    workers_per_gpu=4,
    train=dict(
        type='UDADatasetV2',
        source=dict(
            type=dataset_type,
            data_root=data_root,
            datapipe=datapipe,
            datapipe_cfg=dict(seasons=['spring']),
            reduce_zero_label=reduce_zero_label,
            split='train',
            gt_seg_map_loader_cfg=gt_seg_map_loader_cfg,
            pipeline=source_pipeline),
        target=dict(
            type=dataset_type,
            data_root=data_root,
            datapipe=datapipe,
            datapipe_cfg=dict(seasons=['fall']),
            reduce_zero_label=reduce_zero_label,
            split='train',
            gt_seg_map_loader_cfg=gt_seg_map_loader_cfg,
            pipeline=target_pipeline),
        rare_class_sampling=None),
    val=dict(
        type=dataset_type,
        data_root=data_root,
        datapipe=datapipe,
        datapipe_cfg=dict(seasons=['fall']),
        reduce_zero_label=reduce_zero_label,
        split='val',
        gt_seg_map_loader_cfg=gt_seg_map_loader_cfg,
        pipeline=test_pipeline),
    test=dict(
        type=dataset_type,
        data_root=data_root,
        datapipe=datapipe,
        datapipe_cfg=dict(seasons=['fall']),
        reduce_zero_label=reduce_zero_label,
        split='test',
        gt_seg_map_loader_cfg=gt_seg_map_loader_cfg,
        pipeline=test_pipeline))
