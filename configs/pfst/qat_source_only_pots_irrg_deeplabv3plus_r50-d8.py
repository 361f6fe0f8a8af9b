# Quantization-aware fine-tune of the source-only model (beyond the
# reference, which has no quantization story): every conv/dense trains
# fake-quantized on the int8 deployment grid with STE gradients
# (pfst_tpu/ops/quant.py:qat_training), so the result serves through
# `tools/test.py --quant-int8` at fp32-like accuracy.  Intended use:
# `load_from` a converged fp32 checkpoint, fine-tune a short schedule
# at reduced lr.
_base_ = ['./source_only_pots_irrg_deeplabv3plus_r50-d8.py']
expr_name = 'qat_source_only_pots_irrg_deeplabv3plus_r50-d8'

qat = dict(enabled=True)  # optional: skip=('*conv_seg*',), act_scales=...

# short fine-tune at 1/10 lr: QAT polishes an already-converged model
optimizer = dict(lr=6e-6)
runner = dict(max_iters=4000)
checkpoint_config = dict(interval=1000)
evaluation = dict(interval=1000)
# load_from = 'work_dirs/source_only_pots_irrg_deeplabv3plus_r50-d8/ckpt/40000'
