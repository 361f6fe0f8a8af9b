# FastFCN: R50-d32 + Joint Pyramid Upsampling + PSPHead.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='ResNetV1c', depth=50, num_stages=4,
        out_indices=(1, 2, 3), dilations=(1, 1, 2, 4),
        strides=(1, 2, 2, 2), norm_cfg=norm_cfg,
        contract_dilation=True),
    neck=dict(type='JPU', in_channels=(512, 1024, 2048),
              mid_channels=512, dilations=(1, 2, 4, 8),
              norm_cfg=norm_cfg),
    decode_head=dict(
        type='PSPHead', in_channels=2048, in_index=2, channels=512,
        pool_scales=(1, 2, 3, 6), dropout_ratio=0.1, num_classes=19,
        norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=dict(
        type='FCNHead', in_channels=1024, in_index=1, channels=256,
        num_convs=1, concat_input=False, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=0.4)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
