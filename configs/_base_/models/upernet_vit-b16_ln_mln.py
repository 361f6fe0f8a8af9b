# UPerNet on ViT-B/16 with layer norm + multi-level neck.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='VisionTransformer', img_size=512, patch_size=16,
        embed_dims=768, num_layers=12, num_heads=12,
        out_indices=(2, 5, 8, 11), final_norm=True, mlp_ratio=4,
        drop_rate=0.0, interpolate_mode='bicubic',
        with_cls_token=True, output_cls_token=False),
    neck=dict(type='MultiLevelNeck',
              in_channels=(768, 768, 768, 768), out_channels=768,
              scales=(4, 2, 1, 0.5)),
    decode_head=dict(
        type='UPerHead', in_channels=(768, 768, 768, 768),
        in_index=(0, 1, 2, 3), input_transform='multiple_select',
        pool_scales=(1, 2, 3, 6), channels=768, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    auxiliary_head=dict(
        type='FCNHead', in_channels=768, in_index=2, channels=256,
        num_convs=1, concat_input=False, dropout_ratio=0.1,
        num_classes=19, norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=0.4)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
