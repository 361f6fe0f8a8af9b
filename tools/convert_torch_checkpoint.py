#!/usr/bin/env python
"""Convert a PyTorch mmseg/rsiseg checkpoint into this framework.

Covers the two reference workflows:
  * warm-starting from the ``resnet50_v1c`` ImageNet backbone
    (``configs/_base_/models/deeplabv3plus_r50-d8.py:5``);
  * scoring the released PFST checkpoints — UDA checkpoints carry
    ``model.``/``ema_model.`` prefixes which are stripped exactly like
    ``tools/test.py:237-242`` in the reference.

Layout translation (documented in pfst_tpu/models/backbones/resnet.py):
torch OIHW conv weights -> HWIO; BN weight/bias -> scale/bias params,
running_mean/var -> batch_stats.

Usage:
  python tools/convert_torch_checkpoint.py <ckpt.pth> <config> \
      -o work_dirs/converted [--ema]
"""
import argparse
import os.path as osp
import re
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np


def parse_args(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint', help='torch .pth path')
    p.add_argument('config', help='target model config')
    p.add_argument('-o', '--out-dir', required=True)
    p.add_argument('--ema', action='store_true',
                   help='extract the ema_model (teacher) weights')
    p.add_argument('--backbone-only', action='store_true')
    return p.parse_args(args)


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def torch_key_to_flax(key):
    """Map one mmseg state-dict key to (collection, path) or None."""
    conv_t = lambda: 'kernel'  # noqa: E731

    def bn_leaf(suffix):
        return {
            'weight': ('params', 'scale'),
            'bias': ('params', 'bias'),
            'running_mean': ('batch_stats', 'mean'),
            'running_var': ('batch_stats', 'var'),
            'num_batches_tracked': None,
        }.get(suffix)

    parts = key.split('.')
    top, rest = parts[0], parts[1:]

    if top == 'backbone':
        base = ['backbone_mod']
        if rest[0] == 'stem':
            idx = int(rest[1])
            conv_i = {0: 1, 3: 2, 6: 3}.get(idx)
            bn_i = {1: 1, 4: 2, 7: 3}.get(idx)
            if conv_i is not None and rest[2] == 'weight':
                return 'params', base + [f'stem_conv{conv_i}', 'conv',
                                         'kernel']
            if bn_i is not None:
                leaf = bn_leaf(rest[2])
                if leaf is None:
                    return None
                return leaf[0], base + [f'stem_conv{bn_i}', 'norm', 'bn',
                                        leaf[1]]
            return None
        if rest[0] == 'conv1' and rest[1] == 'weight':
            return 'params', base + ['conv1', 'conv', 'kernel']
        if rest[0] == 'bn1':
            leaf = bn_leaf(rest[1])
            return None if leaf is None else (
                leaf[0], base + ['conv1', 'norm', 'bn', leaf[1]])
        m = re.match(r'layer(\d+)', rest[0])
        if m:
            blk = f'layer{m.group(1)}_block{rest[1]}'
            sub = rest[2]
            if sub.startswith('conv') and rest[3] == 'weight':
                return 'params', base + [blk, sub, 'conv', 'kernel']
            if sub.startswith('bn'):
                leaf = bn_leaf(rest[3])
                return None if leaf is None else (
                    leaf[0], base + [blk, f'conv{sub[2:]}', 'norm', 'bn',
                                     leaf[1]])
            if sub == 'downsample':
                if rest[3] == '0' and rest[4] == 'weight':
                    return 'params', base + [blk, 'downsample', 'conv',
                                             'conv', 'kernel']
                if rest[3] == '1':
                    leaf = bn_leaf(rest[4])
                    return None if leaf is None else (
                        leaf[0], base + [blk, 'downsample', 'conv',
                                         'norm', 'bn', leaf[1]])
        return None

    head_map = {'decode_head': 'decode_head_mod',
                'auxiliary_head': 'aux_heads_0'}
    if top in head_map:
        base = [head_map[top]]

        def conv_module(rest, flax_name):
            # mmcv ConvModule: conv.weight/bias, bn.*
            if rest[0] == 'conv':
                if rest[1] == 'weight':
                    return 'params', base + flax_name + ['conv',
                                                         'kernel']
                if rest[1] == 'bias':
                    return 'params', base + flax_name + ['conv', 'bias']
            if rest[0] == 'bn':
                leaf = bn_leaf(rest[1])
                return None if leaf is None else (
                    leaf[0], base + flax_name + ['norm', 'bn', leaf[1]])
            if rest[0] in ('depthwise_conv', 'pointwise_conv'):
                inner = conv_module(rest[1:], flax_name + [rest[0]])
                return inner
            return None

        r = rest
        if r[0] == 'image_pool':
            # Sequential(AdaptiveAvgPool2d, ConvModule)
            return conv_module(r[2:], ['image_pool_conv'])
        if r[0] == 'aspp_modules':
            return conv_module(r[2:], [f'branch{r[1]}'])
        if r[0] == 'bottleneck':
            return conv_module(r[1:], ['bottleneck'])
        if r[0] == 'c1_bottleneck':
            return conv_module(r[1:], ['c1_bottleneck'])
        if r[0] == 'sep_bottleneck':
            return conv_module(r[2:], [f'sep_bottleneck{int(r[1]) + 1}'])
        if r[0] == 'convs':
            return conv_module(r[2:], [f'conv{r[1]}'])
        if r[0] == 'conv_cat':
            return conv_module(r[1:], ['conv_cat'])
        if r[0] == 'conv_seg':
            leaf = {'weight': 'kernel', 'bias': 'bias'}.get(r[1])
            return None if leaf is None else (
                'params', base + ['cls', 'conv_seg', leaf])
    return None


def convert_state_dict(state_dict, prefix=''):
    params, batch_stats = {}, {}
    skipped = []
    for key, value in state_dict.items():
        k = key
        for strip in ('module.', prefix):
            if strip and k.startswith(strip):
                k = k[len(strip):]
        mapped = torch_key_to_flax(k)
        if mapped is None:
            skipped.append(key)
            continue
        coll, path = mapped
        arr = value.detach().cpu().numpy()
        if path[-1] == 'kernel' and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        _set(params if coll == 'params' else batch_stats, path, arr)
    return params, batch_stats, skipped


def main(args=None):
    args = parse_args(args)
    import torch
    import jax
    import jax.numpy as jnp
    from pfst_tpu.core.checkpoint import save_checkpoint
    from pfst_tpu.models import build_segmentor
    from pfst_tpu.utils import Config

    ckpt = torch.load(args.checkpoint, map_location='cpu',
                      weights_only=False)
    state_dict = ckpt.get('state_dict', ckpt)
    prefix = 'ema_model.' if args.ema else 'model.'
    has_uda_prefix = any(k.startswith(prefix) or
                         k.startswith('module.' + prefix)
                         for k in state_dict)
    if has_uda_prefix:
        state_dict = {k: v for k, v in state_dict.items()
                      if prefix in k}
    params, batch_stats, skipped = convert_state_dict(
        state_dict, prefix if has_uda_prefix else '')
    print(f'converted {sum(1 for _ in _leaves(params))} param tensors, '
          f'{len(skipped)} keys skipped')
    if skipped:
        print('skipped (first 10):', skipped[:10])

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    ref = model.init({'params': jax.random.PRNGKey(0)},
                     jnp.zeros((1, 64, 64, 3)), train=False)

    merged_p = _merge(jax.device_get(ref['params']), params,
                      'params')
    merged_b = _merge(jax.device_get(ref.get('batch_stats', {})),
                      batch_stats, 'batch_stats')
    save_checkpoint(args.out_dir, 0,
                    {'params': merged_p, 'batch_stats': merged_b},
                    meta={'source': args.checkpoint})
    print(f'saved to {args.out_dir}/ckpt/0')


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def _merge(ref, new, name, path=''):
    """Overlay converted tensors onto the reference tree, validating
    shapes; missing keys keep their init values."""
    out = {}
    for k, v in ref.items():
        if isinstance(v, dict):
            out[k] = _merge(v, new.get(k, {}), name, f'{path}/{k}')
        else:
            if k in new:
                nv = np.asarray(new[k])
                if nv.shape != v.shape:
                    raise ValueError(
                        f'{name}{path}/{k}: shape {nv.shape} != '
                        f'{v.shape}')
                out[k] = nv.astype(v.dtype)
            else:
                out[k] = np.asarray(v)
    return out


if __name__ == '__main__':
    main()
