#!/usr/bin/env python
"""Inference FPS benchmark (mirror of /root/reference/tools/benchmark.py).

Protocol preserved: N images, warmup, synchronized timing
(``benchmark.py:80-117``); device sync is ``block_until_ready`` + host
transfer instead of ``torch.cuda.synchronize``.
"""
import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np

from pfst_tpu.utils import Config, DictAction


def parse_args(args=None):
    parser = argparse.ArgumentParser(description='benchmark a model')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--log-interval', type=int, default=50)
    parser.add_argument('--num-images', type=int, default=200)
    parser.add_argument('--warmup', type=int, default=5)
    parser.add_argument('--work-dir', default=None)
    parser.add_argument('--repeat-times', type=int, default=1)
    parser.add_argument('--cfg-options', nargs='+', action=DictAction)
    return parser.parse_args(args)


def main(args=None):
    args = parse_args(args)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    import jax
    import jax.numpy as jnp
    from pfst_tpu.models import build_segmentor

    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    rng = jax.random.PRNGKey(0)
    crop = cfg.get('crop_size') or (512, 512)
    img = jnp.asarray(
        np.random.RandomState(0).randn(1, crop[0], crop[1], 3),
        jnp.float32)
    if args.checkpoint:
        from pfst_tpu.core.checkpoint import (extract_student,
                                              load_checkpoint)
        variables = extract_student(load_checkpoint(args.checkpoint))
    else:
        variables = model.init({'params': rng}, img, train=False)

    @jax.jit
    def infer(variables, img):
        probs, _ = model.apply(variables, img, method=model.inference)
        return jnp.argmax(probs, axis=-1)

    results = []
    for _ in range(args.repeat_times):
        for i in range(args.warmup):
            out = infer(variables, img)
        np.asarray(out)
        t0 = time.perf_counter()
        for i in range(args.num_images):
            out = infer(variables, img)
        np.asarray(out)
        dt = time.perf_counter() - t0
        fps = args.num_images / dt
        results.append(fps)
        print(f'Overall fps: {fps:.2f} img/s')
    summary = {'fps': float(np.mean(results)),
               'fps_std': float(np.std(results)),
               'num_images': args.num_images}
    print(json.dumps(summary))
    if args.work_dir:
        with open(osp.join(args.work_dir, 'benchmark.json'), 'w') as f:
            json.dump(summary, f)
    return summary


if __name__ == '__main__':
    main()
