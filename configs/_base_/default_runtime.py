# Default runtime for pfst_tpu.
# Public surface mirrors /root/reference/configs/_base_/default_runtime.py
# (logging hooks, workflow, dist backend) re-expressed for the JAX
# runtime: the distributed backend is the XLA `data` mesh, not NCCL.
log_config = dict(
    interval=50,
    hooks=[
        dict(type='TextLoggerHook', by_epoch=False),
    ])
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
cudnn_benchmark = False  # kept for config compatibility; no-op on TPU
dist_params = dict(backend='xla')
