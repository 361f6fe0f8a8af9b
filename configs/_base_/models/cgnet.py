# CGNet + FCN classifier.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='CGNet', norm_cfg=norm_cfg, num_channels=(32, 64, 128),
        num_blocks=(3, 21), dilations=(2, 4)),
    decode_head=dict(
        type='FCNHead', in_channels=128, in_index=2, channels=128,
        num_convs=0, concat_input=False, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
