# ICNet (R50-d8 heavy branch) + ICNeck cascade fusion.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='ICNet', norm_cfg=norm_cfg,
        layer_channels=(512, 2048), psp_out_channels=512,
        out_channels=(64, 256, 256),
        backbone_cfg=dict(type='ResNetV1c', depth=50, num_stages=4,
                          out_indices=(0, 1, 2, 3),
                          dilations=(1, 1, 2, 4), strides=(1, 2, 1, 1),
                          norm_cfg=norm_cfg, contract_dilation=True)),
    neck=dict(type='ICNeck', in_channels=(64, 256, 256),
              out_channels=128, norm_cfg=norm_cfg,
              align_corners=False),
    decode_head=dict(
        type='FCNHead', in_channels=128, in_index=2, channels=128,
        num_convs=1, concat_input=False, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=[
        dict(type='FCNHead', in_channels=128, in_index=0, channels=128,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=19, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=False, loss_weight=0.4)),
        dict(type='FCNHead', in_channels=128, in_index=1, channels=128,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=19, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=False, loss_weight=0.4)),
    ],
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
