#!/usr/bin/env python
"""FLOPs/params report (mirror of /root/reference/tools/get_flops.py).

Uses XLA's own cost analysis of the compiled forward — exact for the
program actually executed, unlike the layer-walking estimate of the
reference's mmcv counter.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from pfst_tpu.utils import Config, DictAction


def parse_args(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs='+', default=[2048, 1024])
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    h, w = (args.shape * 2)[:2]

    import jax
    import jax.numpy as jnp
    from pfst_tpu.models import build_segmentor

    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, img,
                           train=False)
    n_params = sum(x.size for x in jax.tree.leaves(variables['params']))

    def fwd(variables, img):
        logits, _ = model.apply(variables, img,
                                method=model.encode_decode)
        return logits

    lowered = jax.jit(fwd).lower(variables, img)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan')) if cost else float('nan')
    print('=' * 30)
    print(f'Input shape: (1, {h}, {w}, 3)')
    print(f'Flops: {flops / 1e9:.2f} GFLOPs')
    print(f'Params: {n_params / 1e6:.2f} M')
    print('=' * 30)
    return flops, n_params


if __name__ == '__main__':
    main()
