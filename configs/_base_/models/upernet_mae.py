# UPerNet on MAE (Feature2Pyramid neck).
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='MAE', img_size=640, patch_size=16, embed_dims=768,
        num_layers=12, num_heads=12, out_indices=(3, 5, 7, 11),
        mlp_ratio=4, init_values=0.1, attn_drop_rate=0.0,
        drop_path_rate=0.1, final_norm=False),
    neck=dict(type='Feature2Pyramid', embed_dim=768,
              rescales=(4, 2, 1, 0.5), norm_cfg=norm_cfg),
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
