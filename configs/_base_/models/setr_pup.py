# SETR progressive-upsampling on ViT.
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(type='VisionTransformer', img_size=512,
                  patch_size=16, embed_dims=1024, num_layers=24,
                  num_heads=16, out_indices=(9, 14, 19, 23)),
    decode_head=dict(
        type='SETRUPHead', in_channels=1024, in_index=3, channels=256,
        num_convs=4, up_scale=2, num_classes=19, norm_cfg=norm_cfg,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
