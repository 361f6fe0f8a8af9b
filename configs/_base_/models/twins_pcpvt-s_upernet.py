# Twins PCPVT-S + UPerNet.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='PCPVT', embed_dims=(64, 128, 320, 512),
        num_heads=(1, 2, 5, 8), depths=(3, 4, 6, 3),
        sr_ratios=(8, 4, 2, 1), mlp_ratios=(8, 8, 4, 4),
        out_indices=(0, 1, 2, 3), drop_path_rate=0.2),
    decode_head=dict(
        type='UPerHead', in_channels=(64, 128, 320, 512),
        in_index=(0, 1, 2, 3), input_transform='multiple_select',
        pool_scales=(1, 2, 3, 6), channels=512, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=dict(
        type='FCNHead', in_channels=320, in_index=2, channels=256,
        num_convs=1, concat_input=False, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=0.4)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
