# DPT on ViT-B/16 (dense prediction transformer).
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    pretrained=None,
    backbone=dict(
        type='VisionTransformer', img_size=224, patch_size=16,
        embed_dims=768, num_layers=12, num_heads=12,
        out_indices=(2, 5, 8, 11), final_norm=False,
        with_cls_token=True, output_cls_token=False),
    decode_head=dict(
        type='DPTHead', in_channels=(768, 768, 768, 768),
        in_index=(0, 1, 2, 3), input_transform='multiple_select',
        channels=256, embed_dims=768,
        post_process_channels=(96, 192, 384, 768),
        readout_type='project', dropout_ratio=0.1, num_classes=19,
        norm_cfg=norm_cfg, align_corners=False,
        loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                         loss_weight=1.0)),
    train_cfg=dict(),
    test_cfg=dict(mode='whole'))
