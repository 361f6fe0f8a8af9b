#!/usr/bin/env python
"""Calibrate static int8 activation scales on a handful of val images.

Static scales drop the per-layer dynamic ``max|x|`` reduction that
``int8_inference()`` otherwise traces (one elementwise pass over every
conv input — pure HBM traffic).  Usage:

    python tools/calibrate_int8.py CONFIG CKPT -o scales.json -n 8
    python tools/test.py CONFIG CKPT --eval mIoU --quant-int8 \
        --act-scales scales.json

The recorded value per module path is the running max of ``max|x|``
over the calibration batches (symmetric PTQ, matching the MXU's
s8×s8→s32 mode); see ``pfst_tpu/ops/quant.py``.
"""
import argparse
import json
import sys

sys.path.insert(0, '.')


def parse_args(args=None):
    p = argparse.ArgumentParser(
        description='Record int8 activation scales from val batches')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None,
                   help='Orbax checkpoint (omit for random init — '
                        'only useful for smoke tests)')
    p.add_argument('-o', '--out', default='act_scales.json')
    p.add_argument('-n', '--num-images', type=int, default=8)
    p.add_argument('-p', '--percentile', type=float, default=100.0,
                   help='clip each batch statistic to this percentile '
                        'of |x| (outlier-robust; 100 = exact max)')
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    from pfst_tpu.utils.set_env import setup_environment
    setup_environment()
    import jax
    import jax.numpy as jnp

    from pfst_tpu.datasets import build_dataset
    from pfst_tpu.models import build_segmentor
    from pfst_tpu.ops.quant import calibrate_act_scales
    from pfst_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.model)
    model_cfg.pop('train_cfg', None)
    model_cfg['pretrained'] = None
    model = build_segmentor(model_cfg)

    if args.checkpoint:
        from pfst_tpu.core.checkpoint import (extract_student,
                                              load_checkpoint)
        variables = extract_student(load_checkpoint(args.checkpoint))
    else:
        variables = jax.jit(
            lambda r, im: model.init({'params': r}, im, train=False))(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    dataset = build_dataset(cfg.data.val if 'val' in cfg.data
                            else cfg.data.test)

    batches = []
    for idx in range(min(args.num_images, len(dataset))):
        sample = dataset[idx]
        imgs = sample['img']
        img = imgs[0] if isinstance(imgs, list) else imgs
        batches.append(jnp.asarray(img)[None])

    scales = calibrate_act_scales(
        lambda b: model.apply(variables, b, method=model.inference),
        batches, percentile=args.percentile)
    with open(args.out, 'w') as f:
        json.dump(scales, f, indent=1, sort_keys=True)
    print(f'{len(scales)} scales over {len(batches)} images '
          f'-> {args.out}')


if __name__ == '__main__':
    main()
