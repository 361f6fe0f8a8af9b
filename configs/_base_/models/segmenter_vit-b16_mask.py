# Segmenter mask transformer on ViT-B/16.
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(type='VisionTransformer', img_size=512,
                  patch_size=16, embed_dims=768, num_layers=12,
                  num_heads=12, out_indices=(11,), final_norm=True),
    decode_head=dict(
        type='SegmenterMaskTransformerHead', in_channels=768,
        channels=768,
        embed_dims=768, num_layers=2, num_heads=12, num_classes=19,
        align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
