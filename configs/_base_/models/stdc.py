# STDC1 + FCN head + boundary (STDCHead) auxiliary.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='STDCNet', stdc_type='STDCNet1', norm_cfg=norm_cfg,
        channels=(32, 64, 256, 512, 1024), bottleneck_type='cat',
        num_convs=4, out_indices=(2, 3, 4)),
    decode_head=dict(
        type='FCNHead', in_channels=1024, in_index=2, channels=256,
        num_convs=1, concat_input=False, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=[
        dict(type='FCNHead', in_channels=512, in_index=1, channels=64,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=19, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=False, loss_weight=0.4)),
        dict(type='STDCHead', in_channels=256, in_index=0, channels=64,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=2, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=False, loss_weight=0.4)),
    ],
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
