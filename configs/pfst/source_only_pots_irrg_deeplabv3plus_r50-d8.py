# Source-only supervised training on Potsdam IRRG (BASELINE config #2).
_base_ = [
    '../_base_/default_runtime.py',
    '../_base_/models/deeplabv3plus_r50-d8.py',
    '../_base_/datasets/pots_irrg2vaih_irrg.py',
    '../_base_/schedules/adamw_40k.py',
]
expr_name = 'source_only_pots_irrg_deeplabv3plus_r50-d8'
seed = 0

model = dict(
    decode_head=dict(num_classes=6),
    auxiliary_head=dict(num_classes=6),
)

# replace the UDA pairing with the plain source dataset
data = dict(
    train=dict(
        _delete_=True,
        type='ISPRSDataset',
        data_root='data/Potsdam_IRRG_1024',
        img_dir='img_dir/train',
        ann_dir='ann_dir/train',
        gt_seg_map_loader_cfg=dict(reduce_zero_label=True),
        pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='LoadAnnotations', reduce_zero_label=True),
            dict(type='Resize', img_scale=(576, 576),
                 ratio_range=(0.5, 2.0)),
            dict(type='RandomCrop', crop_size=(512, 512),
                 cat_max_ratio=0.75),
            dict(type='RandomRotate90', prob=1.0),
            dict(type='RandomFlip', flip_ratio=0.5,
                 direction='vertical'),
            dict(type='RandomFlip', flip_ratio=0.5,
                 direction='horizontal'),
            dict(type='PhotoMetricDistortion'),
            dict(type='Normalize',
                 mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_rgb=True),
            dict(type='Pad', size=(512, 512), pad_val=0,
                 seg_pad_val=255),
            dict(type='DefaultFormatBundle'),
            dict(type='Collect', keys=['img', 'gt_semantic_seg']),
        ]))
optimizer = dict(lr=6e-05)
