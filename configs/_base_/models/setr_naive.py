# SETR-Naive: ViT-L + single-stage upsample head.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='VisionTransformer', img_size=768, patch_size=16,
        embed_dims=1024, num_layers=24, num_heads=16,
        out_indices=(9, 14, 19, 23), final_norm=False, drop_rate=0.1,
        with_cls_token=True, output_cls_token=False),
    decode_head=dict(
        type='SETRUPHead', in_channels=1024, in_index=3, channels=256,
        num_convs=1, up_scale=4, kernel_size=1, dropout_ratio=0.0,
        num_classes=19, norm_cfg=dict(type='LN'), align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=[
        dict(type='SETRUPHead', in_channels=1024, in_index=0, channels=256,
             num_convs=1, up_scale=4, kernel_size=1, dropout_ratio=0.0,
             num_classes=19, norm_cfg=dict(type='LN'),
             align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=False, loss_weight=0.4)),
        dict(type='SETRUPHead', in_channels=1024, in_index=1, channels=256,
             num_convs=1, up_scale=4, kernel_size=1, dropout_ratio=0.0,
             num_classes=19, norm_cfg=dict(type='LN'),
             align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=False, loss_weight=0.4)),
        dict(type='SETRUPHead', in_channels=1024, in_index=2, channels=256,
             num_convs=1, up_scale=4, kernel_size=1, dropout_ratio=0.0,
             num_classes=19, norm_cfg=dict(type='LN'),
             align_corners=False,
             loss_decode=dict(type='CrossEntropyLoss',
                              use_sigmoid=False, loss_weight=0.4)),
    ],
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
