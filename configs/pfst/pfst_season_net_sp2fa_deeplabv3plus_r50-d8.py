# PFST: SeasonNet spring -> fall (33 classes, 128^2 crops).
_base_ = [
    '../_base_/default_runtime.py',
    '../_base_/models/deeplabv3plus_r50-d8.py',
    '../_base_/datasets/season_net_sp2fa.py',
    '../_base_/uda/pfst.py',
    '../_base_/schedules/adamw_40k.py',
]
expr_name = 'pfst_season_net_sp2fa_deeplabv3plus_r50-d8'

seed = 0

model = dict(
    decode_head=dict(num_classes=33),
    auxiliary_head=dict(num_classes=33),
)

optimizer_config = None
optimizer = dict(lr=6e-05)

uda = dict(
    aux_losses=[
        dict(
            type='PFGSTLoss',
            kernel_size=3,
            dilation=2,
            top_k=3,
            weights={'src_pos': 0.1, 'src_neg': 0.1, 'sim_pos': 0.1,
                     'sim_neg': 0.1, 'src_pos_std': 0.1,
                     'src_neg_std': 0.1},
            sim_type='cosine',
            feat_level=None,
            detach_unfold=True,
            downscale=1),
    ],
    alpha=0.999,
    thre_type='all',
    pseudo_threshold=0.98,
    trg_loss_weight=1.,
    use_decoded_feats=True,
    strong_aug_denorm_type='none',
)

log_config = dict(
    interval=50,
    hooks=[dict(type='TextLoggerHook', by_epoch=False)])
