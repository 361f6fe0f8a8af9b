# SETR-MLA: ViT-L + multi-level aggregation neck + MLA head.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='VisionTransformer', img_size=768, patch_size=16,
        embed_dims=1024, num_layers=24, num_heads=16,
        out_indices=(9, 14, 19, 23), final_norm=False,
        with_cls_token=True, output_cls_token=False),
    neck=dict(type='MLANeck', in_channels=(1024, 1024, 1024, 1024),
              out_channels=256),
    decode_head=dict(
        type='SETRMLAHead', in_channels=(256, 256, 256, 256),
        in_index=(0, 1, 2, 3), input_transform='multiple_select',
        channels=512, mla_channels=128, up_scale=4, dropout_ratio=0.0,
        num_classes=19, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
