# Poly power-1.0 LR with 1500-iter linear warmup (no optimizer/runner).
# Mirrors /root/reference/configs/_base_/schedules/poly10warm.py.
lr_config = dict(
    policy='poly',
    warmup='linear',
    warmup_iters=1500,
    warmup_ratio=1e-6,
    power=1.0,
    min_lr=0.0,
    by_epoch=False)
