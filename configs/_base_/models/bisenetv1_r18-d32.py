# BiSeNetV1 (R18 context path) + FCN heads.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='BiSeNetV1', norm_cfg=norm_cfg,
        context_channels=(128, 256, 512),
        spatial_channels=(64, 64, 64, 128), out_channels=256,
        out_indices=(0, 1, 2),
        backbone_cfg=dict(type='ResNet', depth=18, num_stages=4,
                          out_indices=(0, 1, 2, 3), norm_cfg=norm_cfg)),
    decode_head=dict(
        type='FCNHead', in_channels=256, in_index=0, channels=256,
        num_convs=1, concat_input=False, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=[
        dict(type='FCNHead', in_channels=128, in_index=1, channels=64,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=19, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=False, loss_weight=1.0)),
        dict(type='FCNHead', in_channels=128, in_index=2, channels=64,
             num_convs=1, concat_input=False, dropout_ratio=0.1,
             num_classes=19, norm_cfg=norm_cfg, align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=False, loss_weight=1.0)),
    ],
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
