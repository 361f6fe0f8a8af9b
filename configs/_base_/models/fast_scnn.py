# Fast-SCNN + depthwise-separable FCN head.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='FastSCNN', norm_cfg=norm_cfg,
        downsample_dw_channels=(32, 48), global_in_channels=64,
        global_block_channels=(64, 96, 128),
        global_block_strides=(2, 2, 1), global_out_channels=128,
        fusion_out_channels=128, out_indices=(0, 1, 2)),
    decode_head=dict(
        type='DepthwiseSeparableFCNHead', in_channels=128, in_index=-1,
        channels=128, num_convs=1, concat_input=False,
        dropout_ratio=0.1, num_classes=19, norm_cfg=norm_cfg,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=True,
                         loss_weight=1.0)),
    auxiliary_head=[
        dict(type='FCNHead', in_channels=128, in_index=-2, channels=32,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=19, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=True, loss_weight=0.4)),
        dict(type='FCNHead', in_channels=64, in_index=-3, channels=32,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=19, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=True, loss_weight=0.4)),
    ],
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
