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
            # flax nests the branches under the ASPPModule submodule
            return conv_module(r[2:], ['aspp_modules',
                                       f'branch{r[1]}'])
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


# ------------------------------------------------------------------ #
# Transformer backbones.  Replaces the reference's
# ``tools/model_converters/{beit,mit,swin,vit}2mmseg.py`` (official ->
# mmseg renames) and adds the mmseg-torch -> flax layout translation.

def _t(a):
    """torch Linear weight (out, in) -> Dense kernel (in, out)."""
    return a.transpose(1, 0)


def _c(a):
    """torch conv OIHW -> flax HWIO."""
    return a.transpose(2, 3, 1, 0)


def _ln(leaf):
    return {'weight': 'scale', 'bias': 'bias'}.get(leaf)


def official_to_mmseg(sd, arch):
    """Official-release key names -> mmseg names (the rename pass of
    the reference ``*2mmseg.py`` converters)."""
    out = {}
    if arch == 'mit':
        # mit2mmseg.py: blockN/patch_embedN/normN -> layers.{N-1}.{1,0,2}
        for k, v in sd.items():
            if k.startswith('head'):
                continue
            m = re.match(r'patch_embed(\d+)\.(.*)', k)
            if m:
                rest = m.group(2).replace('proj.', 'projection.')
                out[f'layers.{int(m.group(1)) - 1}.0.{rest}'] = v
                continue
            m = re.match(r'block(\d+)\.(\d+)\.(.*)', k)
            if m:
                s, b, rest = int(m.group(1)) - 1, m.group(2), m.group(3)
                if rest.startswith('attn.q.'):
                    kv = sd[k.replace('.q.', '.kv.')]
                    import numpy as _np
                    v = _np.concatenate(
                        [_np.asarray(v), _np.asarray(kv)], axis=0)
                    rest = rest.replace('attn.q.', 'attn.attn.in_proj_')
                elif rest.startswith('attn.kv.'):
                    continue
                elif rest.startswith('attn.proj.'):
                    rest = rest.replace('attn.proj.',
                                        'attn.attn.out_proj.')
                elif rest.startswith('mlp.'):
                    rest = rest.replace('mlp.fc1.', 'ffn.layers.0.') \
                               .replace('mlp.dwconv.dwconv.',
                                        'ffn.layers.1.') \
                               .replace('mlp.fc2.', 'ffn.layers.4.')
                out[f'layers.{s}.1.{b}.{rest}'] = v
                continue
            m = re.match(r'norm(\d+)\.(.*)', k)
            if m:
                out[f'layers.{int(m.group(1)) - 1}.2.{m.group(2)}'] = v
                continue
            out[k] = v
        return out
    if arch in ('beit', 'vit'):
        for k, v in sd.items():
            nk = k.replace('patch_embed.proj', 'patch_embed.projection')
            if nk.startswith('blocks'):
                nk = nk.replace('blocks', 'layers')
                if arch == 'vit':
                    # vit2mmseg.py attention renames
                    nk = nk.replace('attn.qkv.', 'attn.attn.in_proj_') \
                           .replace('attn.proj.', 'attn.attn.out_proj.')
                nk = nk.replace('.norm', '.ln') \
                       .replace('mlp.fc1', 'ffn.layers.0.0') \
                       .replace('mlp.fc2', 'ffn.layers.1')
            elif nk == 'norm.weight':
                nk = 'ln1.weight'
            elif nk == 'norm.bias':
                nk = 'ln1.bias'
            out[nk] = v
        return out
    if arch == 'swin':
        for k, v in sd.items():
            if k.startswith('head'):
                continue
            nk = k.replace('patch_embed.proj', 'patch_embed.projection')
            if nk.startswith('layers'):
                nk = 'stages' + nk[len('layers'):]
                nk = nk.replace('.attn.', '.attn.w_msa.') \
                       .replace('mlp.fc1', 'ffn.layers.0.0') \
                       .replace('mlp.fc2', 'ffn.layers.1')
            out[nk] = v
        return out
    return dict(sd)


def _unfold_to_official_vec(v):
    """mmcv-PatchMerging channel order -> official/position-major.

    mmcv merges 2x2 windows with ``nn.Unfold`` (channel-major,
    window row-major: index = c*4 + p_rm), while the official Swin —
    and this repo's ``swin.py`` merge concat — is position-major in
    the order (0,0),(1,0),(0,1),(1,1): index = p*C + c. The position
    permutation [0, 2, 1, 3] maps between the two window orders (the
    reference ``swin2mmseg.py`` applies the inverse of this when going
    official->mmseg).
    """
    c = v.shape[0] // 4
    return v.reshape(c, 4)[:, [0, 2, 1, 3]].T.reshape(-1)


def _unfold_to_official_mat(w):
    """(out, 4C) reduction weight, mmcv order -> official order."""
    out, in4 = w.shape
    c = in4 // 4
    return w.reshape(out, c, 4)[:, :, [0, 2, 1, 3]] \
            .transpose(0, 2, 1).reshape(out, in4)


def transformer_key_to_flax(key, arr, arch, official=False):
    """One mmseg-named backbone tensor -> [(collection, path, array)].

    Returns None for unknown keys, [] for deliberately dropped buffers
    (``relative_position_index`` is recomputed statically here).
    ``official``: the weights came from an official release (renamed
    by ``official_to_mmseg``), so Swin PatchMerging weights are already
    position-major and need no unfold-order correction.
    """
    import numpy as np
    base = ['backbone_mod']
    if 'relative_position_index' in key or 'attn_mask' in key:
        return []
    if arch in ('beit', 'mae'):
        if key == 'cls_token' or key == 'pos_embed':
            return [('params', base + [key], arr)]
        if key.startswith('patch_embed.projection.'):
            leaf = key.rsplit('.', 1)[1]
            a = _c(arr) if leaf == 'weight' else arr
            return [('params', base + ['patch_embed',
                                       'kernel' if leaf == 'weight'
                                       else 'bias'], a)]
        m = re.match(r'ln1\.(weight|bias)$', key)
        if m:  # final norm (beit.py:345-347)
            return [('params', base + ['norm1', _ln(m.group(1))], arr)]
        m = re.match(r'layers\.(\d+)\.(.*)', key)
        if not m:
            return None
        blk = [f'layers_{m.group(1)}']
        rest = m.group(2)
        for ln, ours in (('ln1', 'norm1'), ('ln2', 'norm2')):
            mm = re.match(rf'{ln}\.(weight|bias)$', rest)
            if mm:
                return [('params', base + blk + [ours,
                                                 _ln(mm.group(1))],
                         arr)]
        if rest in ('gamma_1', 'gamma_2'):
            return [('params', base + blk + [rest], arr)]
        if rest in ('attn.q_bias', 'attn.v_bias'):
            return [('params', base + blk + ['attn',
                                             rest.split('.')[1]], arr)]
        if rest == 'attn.relative_position_bias_table':
            return [('params', base + blk +
                     ['attn', 'relative_position_bias_table'], arr)]
        mm = re.match(r'attn\.(qkv|proj)\.(weight|bias)$', rest)
        if mm:
            a = _t(arr) if mm.group(2) == 'weight' else arr
            return [('params', base + blk + ['attn', mm.group(1),
                                             'kernel'
                                             if mm.group(2) == 'weight'
                                             else 'bias'], a)]
        mm = re.match(r'ffn\.layers\.(0\.0|1)\.(weight|bias)$', rest)
        if mm:
            fc = 'fc1' if mm.group(1) == '0.0' else 'fc2'
            a = _t(arr) if mm.group(2) == 'weight' else arr
            return [('params', base + blk + [fc,
                                             'kernel'
                                             if mm.group(2) == 'weight'
                                             else 'bias'], a)]
        return None
    if arch == 'vit':
        if key in ('cls_token', 'pos_embed'):
            return [('params', base + [key], arr)]
        if key.startswith('patch_embed.projection.'):
            leaf = key.rsplit('.', 1)[1]
            a = _c(arr) if leaf == 'weight' else arr
            return [('params', base + ['patch_embed',
                                       'kernel' if leaf == 'weight'
                                       else 'bias'], a)]
        m = re.match(r'ln1\.(weight|bias)$', key)
        if m:
            return [('params', base + ['final_norm', _ln(m.group(1))],
                     arr)]
        m = re.match(r'layers\.(\d+)\.(.*)', key)
        if not m:
            return None
        blk = [f'block{m.group(1)}']
        rest = m.group(2)
        for ln, ours in (('ln1', 'norm1'), ('ln2', 'norm2')):
            mm = re.match(rf'{ln}\.(weight|bias)$', rest)
            if mm:
                return [('params', base + blk + [ours,
                                                 _ln(mm.group(1))],
                         arr)]
        if rest == 'attn.attn.in_proj_weight':
            return [('params', base + blk + ['qkv', 'kernel'], _t(arr))]
        if rest == 'attn.attn.in_proj_bias':
            return [('params', base + blk + ['qkv', 'bias'], arr)]
        mm = re.match(r'attn\.attn\.out_proj\.(weight|bias)$', rest)
        if mm:
            a = _t(arr) if mm.group(1) == 'weight' else arr
            return [('params', base + blk + ['proj',
                                             'kernel'
                                             if mm.group(1) == 'weight'
                                             else 'bias'], a)]
        mm = re.match(r'ffn\.layers\.(0\.0|1)\.(weight|bias)$', rest)
        if mm:
            fc = 'fc1' if mm.group(1) == '0.0' else 'fc2'
            a = _t(arr) if mm.group(2) == 'weight' else arr
            return [('params', base + blk + [fc,
                                             'kernel'
                                             if mm.group(2) == 'weight'
                                             else 'bias'], a)]
        return None
    if arch == 'swin':
        if key.startswith('patch_embed.projection.'):
            leaf = key.rsplit('.', 1)[1]
            a = _c(arr) if leaf == 'weight' else arr
            return [('params', base + ['patch_embed',
                                       'kernel' if leaf == 'weight'
                                       else 'bias'], a)]
        m = re.match(r'patch_embed\.norm\.(weight|bias)$', key)
        if m:
            return [('params', base + ['patch_norm', _ln(m.group(1))],
                     arr)]
        m = re.match(r'norm(\d+)\.(weight|bias)$', key)
        if m:
            return [('params', base + [f'out_norm{m.group(1)}',
                                       _ln(m.group(2))], arr)]
        m = re.match(r'stages\.(\d+)\.downsample\.norm\.(weight|bias)$',
                     key)
        if m:
            a = arr if official else _unfold_to_official_vec(arr)
            return [('params', base + [f'merge_norm{int(m.group(1)) + 1}',
                                       _ln(m.group(2))], a)]
        m = re.match(r'stages\.(\d+)\.downsample\.reduction\.weight$',
                     key)
        if m:
            a = arr if official else _unfold_to_official_mat(arr)
            return [('params', base + [f'merge_reduce{int(m.group(1)) + 1}',
                                       'kernel'], _t(a))]
        m = re.match(r'stages\.(\d+)\.blocks\.(\d+)\.(.*)', key)
        if not m:
            return None
        blk = [f'stage{m.group(1)}_block{m.group(2)}']
        rest = m.group(3)
        mm = re.match(r'norm([12])\.(weight|bias)$', rest)
        if mm:
            return [('params', base + blk + [f'norm{mm.group(1)}',
                                             _ln(mm.group(2))], arr)]
        if rest == 'attn.w_msa.relative_position_bias_table':
            return [('params', base + blk +
                     ['attn', 'relative_position_bias_table'], arr)]
        mm = re.match(r'attn\.w_msa\.(qkv|proj)\.(weight|bias)$', rest)
        if mm:
            a = _t(arr) if mm.group(2) == 'weight' else arr
            return [('params', base + blk + ['attn', mm.group(1),
                                             'kernel'
                                             if mm.group(2) == 'weight'
                                             else 'bias'], a)]
        mm = re.match(r'ffn\.layers\.(0\.0|1)\.(weight|bias)$', rest)
        if mm:
            fc = 'fc1' if mm.group(1) == '0.0' else 'fc2'
            a = _t(arr) if mm.group(2) == 'weight' else arr
            return [('params', base + blk + [fc,
                                             'kernel'
                                             if mm.group(2) == 'weight'
                                             else 'bias'], a)]
        return None
    if arch == 'mit':
        m = re.match(r'layers\.(\d+)\.0\.projection\.(weight|bias)$',
                     key)
        if m:
            a = _c(arr) if m.group(2) == 'weight' else arr
            return [('params', base + [f'patch_embed{m.group(1)}',
                                       'kernel'
                                       if m.group(2) == 'weight'
                                       else 'bias'], a)]
        m = re.match(r'layers\.(\d+)\.0\.norm\.(weight|bias)$', key)
        if m:
            return [('params', base + [f'embed_norm{m.group(1)}',
                                       _ln(m.group(2))], arr)]
        m = re.match(r'layers\.(\d+)\.2\.(weight|bias)$', key)
        if m:
            return [('params', base + [f'stage_norm{m.group(1)}',
                                       _ln(m.group(2))], arr)]
        m = re.match(r'layers\.(\d+)\.1\.(\d+)\.(.*)', key)
        if not m:
            return None
        blk = [f'stage{m.group(1)}_block{m.group(2)}']
        rest = m.group(3)
        mm = re.match(r'norm([12])\.(weight|bias)$', rest)
        if mm:
            return [('params', base + blk + [f'norm{mm.group(1)}',
                                             _ln(mm.group(2))], arr)]
        if rest in ('attn.attn.in_proj_weight', 'attn.attn.in_proj_bias'):
            c = arr.shape[0] // 3
            leaf = 'kernel' if rest.endswith('weight') else 'bias'
            chunks = [arr[:c], arr[c:2 * c], arr[2 * c:]]
            if leaf == 'kernel':
                chunks = [_t(a) for a in chunks]
            return [('params', base + blk + ['attn', n, leaf], a)
                    for n, a in zip(('q', 'k', 'v'), chunks)]
        mm = re.match(r'attn\.attn\.out_proj\.(weight|bias)$', rest)
        if mm:
            a = _t(arr) if mm.group(1) == 'weight' else arr
            return [('params', base + blk + ['attn', 'proj',
                                             'kernel'
                                             if mm.group(1) == 'weight'
                                             else 'bias'], a)]
        mm = re.match(r'attn\.sr\.(weight|bias)$', rest)
        if mm:
            a = _c(arr) if mm.group(1) == 'weight' else arr
            return [('params', base + blk + ['attn', 'sr',
                                             'kernel'
                                             if mm.group(1) == 'weight'
                                             else 'bias'], a)]
        mm = re.match(r'attn\.norm\.(weight|bias)$', rest)
        if mm:
            return [('params', base + blk + ['attn', 'sr_norm',
                                             _ln(mm.group(1))], arr)]
        # MixFFN Sequential: 0 = fc1 (1x1 conv), 1 = dw conv, 4 = fc2
        mm = re.match(r'ffn\.layers\.([014])\.(weight|bias)$', rest)
        if mm:
            idx, leaf = mm.group(1), mm.group(2)
            name = {'0': 'fc1', '1': 'dwconv', '4': 'fc2'}[idx]
            a = arr
            if leaf == 'weight':
                if idx in ('0', '4'):      # 1x1 conv -> Dense kernel
                    a = _t(arr[..., 0, 0]) if arr.ndim == 4 else _t(arr)
                else:                       # depthwise 3x3
                    a = _c(arr)
            return [('params', base + blk + ['ffn', name,
                                             'kernel'
                                             if leaf == 'weight'
                                             else 'bias'], a)]
        return None
    return None


TRANSFORMER_ARCHS = {
    'BEiT': 'beit', 'MAE': 'beit', 'VisionTransformer': 'vit',
    'SwinTransformer': 'swin', 'MixVisionTransformer': 'mit',
}


def convert_transformer_state_dict(state_dict, arch, prefix=''):
    """mmseg/official transformer checkpoint -> flax trees."""
    sd = {}
    for key, value in state_dict.items():
        k = key
        for strip in ('module.', prefix):
            if strip and k.startswith(strip):
                k = k[len(strip):]
        sd[k] = value
    bare = {k[len('backbone.'):] if k.startswith('backbone.') else k: v
            for k, v in sd.items() if not k.startswith(
                ('decode_head.', 'auxiliary_head.', 'neck.'))}
    # arch-aware naming detection: the mmseg marker differs per family
    # (official Swin itself uses ``layers.``, which mmseg renames to
    # ``stages.`` — so ``layers.`` means OFFICIAL there, not mmseg)
    if arch == 'swin':
        official = not any(k.startswith('stages.') for k in bare)
    elif arch == 'mit':
        official = not any(k.startswith('layers.') for k in bare)
    else:  # beit/vit: official releases use ``blocks.``
        official = not any(k.startswith('layers.') or
                           'ffn.layers' in k for k in bare)
    if official:
        bare = official_to_mmseg(bare, arch)
    params, batch_stats, skipped = {}, {}, []
    for key, value in bare.items():
        arr = value.detach().cpu().numpy() if hasattr(value, 'detach') \
            else np.asarray(value)
        entries = transformer_key_to_flax(key, arr, arch,
                                          official=official)
        if entries is None:
            skipped.append(key)
            continue
        for coll, path, a in entries:
            _set(params if coll == 'params' else batch_stats, path, a)
    # head keys go through the generic mapper
    for key, value in sd.items():
        if key.startswith(('decode_head.', 'auxiliary_head.')):
            mapped = torch_key_to_flax(key)
            if mapped is None:
                skipped.append(key)
                continue
            coll, path = mapped
            arr = value.detach().cpu().numpy()
            if path[-1] == 'kernel' and arr.ndim == 4:
                arr = _c(arr)
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
    cfg = Config.fromfile(args.config)
    bb_type = cfg.model['backbone']['type']
    # timm/torchvision-style checkpoints carry bare backbone keys
    # (conv1.weight, layer1.0...., no 'backbone.' prefix): prefix them
    # so the standard mapping applies; classifier heads (fc.*) fall
    # into the skipped list naturally
    known_tops = ('backbone.', 'decode_head.', 'auxiliary_head.',
                  'module.', 'model.', 'ema_model.')
    if not any(k.startswith(known_tops) for k in state_dict):
        state_dict = {'backbone.' + k: v for k, v in
                      state_dict.items()}
        print('bare (timm/torchvision-style) state dict: '
              'prefixed all keys with backbone.')
    if bb_type == 'TIMMBackbone':
        # resolve the adapter's inner backbone for arch dispatch
        from pfst_tpu.models.backbones.timm_backbone import _TIMM_MAP
        inner = _TIMM_MAP[cfg.model['backbone'].get(
            'model_name', 'resnet50')]
        bb_type = inner['type']
    arch = TRANSFORMER_ARCHS.get(bb_type)
    if arch is not None:
        params, batch_stats, skipped = convert_transformer_state_dict(
            state_dict, arch, prefix if has_uda_prefix else '')
    else:
        params, batch_stats, skipped = convert_state_dict(
            state_dict, prefix if has_uda_prefix else '')
    print(f'converted {sum(1 for _ in _leaves(params))} param tensors, '
          f'{len(skipped)} keys skipped')
    if skipped:
        print('skipped (first 10):', skipped[:10])
    if cfg.model['backbone']['type'] == 'TIMMBackbone':
        # the adapter nests the resolved backbone under 'inner'
        for tree in (params, batch_stats):
            if 'backbone_mod' in tree:
                tree['backbone_mod'] = {
                    'inner': tree.pop('backbone_mod')}

    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    init_hw = (64, 64)
    if arch == 'beit':
        # BEiT/MAE rel-pos tables require the configured patch grid
        s = cfg.model['backbone'].get('img_size', 224)
        init_hw = (s, s) if isinstance(s, int) else tuple(s)
    ref = model.init({'params': jax.random.PRNGKey(0)},
                     jnp.zeros((1, *init_hw, 3)), train=False)

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
