# Twins PCPVT-S + semantic FPN.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='PCPVT', embed_dims=(64, 128, 320, 512),
        num_heads=(1, 2, 5, 8), depths=(3, 4, 6, 3),
        sr_ratios=(8, 4, 2, 1), mlp_ratios=(8, 8, 4, 4),
        out_indices=(0, 1, 2, 3), drop_path_rate=0.2),
    neck=dict(type='FPN', in_channels=(64, 128, 320, 512),
              out_channels=256, num_outs=4),
    decode_head=dict(
        type='FPNHead', in_channels=(256, 256, 256, 256),
        in_index=(0, 1, 2, 3), feature_strides=(4, 8, 16, 32),
        channels=128, dropout_ratio=0.1, num_classes=19,
        norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
