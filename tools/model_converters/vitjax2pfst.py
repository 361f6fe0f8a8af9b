#!/usr/bin/env python
"""AugReg jax-ViT checkpoints (.npz) -> pfst_tpu VisionTransformer.

Counterpart of the reference's ``tools/model_converters/
vitjax2mmseg.py`` (which maps the same AugReg/"How to train your ViT"
``.npz`` releases onto mmseg's torch ViT).  This framework is itself
JAX, so the mapping is direct — no OIHW permutes, just per-head
reshapes onto the fused qkv layout:

    embedding/{kernel,bias}                  -> patch_embed
    cls                                      -> cls_token
    Transformer/posembed_input/pos_embedding -> pos_embed
    Transformer/encoder_norm/*               -> final_norm
    Transformer/encoderblock_i/
        LayerNorm_0                          -> block{i}/norm1
        MultiHeadDotProductAttention_1/
            {query,key,value}  (D,H,hd)      -> block{i}/qkv  (D,3D)
            out                (H,hd,D)      -> block{i}/proj (D,D)
        LayerNorm_2                          -> block{i}/norm2
        MlpBlock_3/Dense_{0,1}               -> block{i}/{fc1,fc2}

Classification-head tensors (``head/*``, ``pre_logits/*``) are
segmentation-irrelevant and skipped, as the reference converter skips
them.  Semantic parity is tested in
``tests/test_vitjax_convert.py`` by forward-matching an AugReg-style
encoder built from ``nn.MultiHeadDotProductAttention`` against our
``VisionTransformer`` loaded with the converted tree.

Usage:
    python tools/model_converters/vitjax2pfst.py \
        ViT-B_16.npz <config with VisionTransformer backbone> -o out/
"""
import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', '..'))


def convert_vit_jax(weights, prefix='backbone_mod'):
    """AugReg npz mapping -> flax params tree for our ViT.

    ``weights``: dict-like of numpy arrays (an opened ``.npz`` or a
    plain dict).  Returns the nested params dict (under ``prefix``
    when given, as the segmentor stores the backbone)."""
    w = {k: np.asarray(v) for k, v in dict(weights).items()}
    out = {}

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.ascontiguousarray(value)

    put(['patch_embed', 'kernel'], w['embedding/kernel'])
    put(['patch_embed', 'bias'], w['embedding/bias'])
    if 'cls' in w:
        put(['cls_token'], w['cls'].reshape(1, 1, -1))
    pos = w['Transformer/posembed_input/pos_embedding']
    put(['pos_embed'], pos)
    put(['final_norm', 'scale'], w['Transformer/encoder_norm/scale'])
    put(['final_norm', 'bias'], w['Transformer/encoder_norm/bias'])

    n_layers = 1 + max(
        int(k.split('encoderblock_')[1].split('/')[0])
        for k in w if 'encoderblock_' in k)
    for i in range(n_layers):
        jb = f'Transformer/encoderblock_{i}'
        blk = f'block{i}'
        put([blk, 'norm1', 'scale'], w[f'{jb}/LayerNorm_0/scale'])
        put([blk, 'norm1', 'bias'], w[f'{jb}/LayerNorm_0/bias'])
        put([blk, 'norm2', 'scale'], w[f'{jb}/LayerNorm_2/scale'])
        put([blk, 'norm2', 'bias'], w[f'{jb}/LayerNorm_2/bias'])
        att = f'{jb}/MultiHeadDotProductAttention_1'
        d = w[f'{att}/query/kernel'].shape[0]
        qkv_k = np.concatenate(
            [w[f'{att}/{n}/kernel'].reshape(d, -1)
             for n in ('query', 'key', 'value')], axis=1)
        qkv_b = np.concatenate(
            [w[f'{att}/{n}/bias'].reshape(-1)
             for n in ('query', 'key', 'value')])
        put([blk, 'qkv', 'kernel'], qkv_k)
        put([blk, 'qkv', 'bias'], qkv_b)
        put([blk, 'proj', 'kernel'],
            w[f'{att}/out/kernel'].reshape(-1, d))
        put([blk, 'proj', 'bias'], w[f'{att}/out/bias'])
        mlp = f'{jb}/MlpBlock_3'
        put([blk, 'fc1', 'kernel'], w[f'{mlp}/Dense_0/kernel'])
        put([blk, 'fc1', 'bias'], w[f'{mlp}/Dense_0/bias'])
        put([blk, 'fc2', 'kernel'], w[f'{mlp}/Dense_1/kernel'])
        put([blk, 'fc2', 'bias'], w[f'{mlp}/Dense_1/bias'])

    skipped = [k for k in w
               if k.startswith(('head/', 'pre_logits/'))]
    if prefix:
        return {prefix: out}, skipped
    return out, skipped


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint', help='AugReg .npz path')
    p.add_argument('config', help='target model config (ViT backbone)')
    p.add_argument('-o', '--out-dir', required=True)
    a = p.parse_args(args)

    import jax
    import jax.numpy as jnp
    from pfst_tpu.core.checkpoint import save_checkpoint
    from pfst_tpu.models import build_segmentor
    from pfst_tpu.utils import Config

    weights = np.load(a.checkpoint)
    params, skipped = convert_vit_jax(weights)
    print(f'converted ViT tree; skipped: {skipped}')

    cfg = Config.fromfile(a.config)
    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    s = cfg.model['backbone'].get('img_size', 224)
    init_hw = (s, s) if isinstance(s, int) else tuple(s)
    ref = model.init({'params': jax.random.PRNGKey(0)},
                     jnp.zeros((1, *init_hw, 3)), train=False)

    sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))
    from convert_torch_checkpoint import _merge
    merged = _merge(jax.device_get(ref['params']), params, 'params')
    save_checkpoint(a.out_dir, 0,
                    {'params': merged,
                     'batch_stats': jax.device_get(
                         ref.get('batch_stats', {}))},
                    meta={'source': a.checkpoint})
    print(f'saved to {a.out_dir}/ckpt/0')


if __name__ == '__main__':
    main()
