#!/usr/bin/env python
"""Rename an official Twins (PCPVT/SVT) checkpoint to mmseg-style keys
(reference ``tools/model_converters/twins2mmseg.py``).

Pure rename pass; the flax-side layout conversion for Twins is not yet
wired into ``convert_torch_checkpoint.py`` (BEiT/MAE/ViT/Swin/MiT are).
"""
import argparse
import os
import os.path as osp


def convert_twins(sd, model: str):
    import torch
    out = {}
    for k, v in sd.items():
        if k.startswith('head'):
            continue
        nk, nv = k, v
        if k.startswith('patch_embeds'):
            nk = k.replace('proj.', 'projection.')
        elif k.startswith('blocks'):
            if 'attn.q.' in k:
                nk = k.replace('q.', 'attn.in_proj_')
                nv = torch.cat(
                    [v, sd[k.replace('attn.q.', 'attn.kv.')]], dim=0)
            elif 'attn.kv.' in k:
                continue
            elif 'mlp.fc1' in k:
                nk = k.replace('mlp.fc1', 'ffn.layers.0.0')
            elif 'mlp.fc2' in k:
                nk = k.replace('mlp.fc2', 'ffn.layers.1')
            elif 'attn.proj.' in k:
                if model == 'pcpvt':
                    nk = k.replace('proj.', 'attn.out_proj.')
                else:
                    # svt: only odd (global-attention) blocks use the
                    # nn.MultiheadAttention wrapper
                    if int(k.split('.')[2]) % 2 == 1:
                        nk = k.replace('proj.', 'attn.out_proj.')
            nk = nk.replace('blocks.', 'layers.')
        elif k.startswith('pos_block'):
            nk = k.replace('pos_block', 'position_encodings')
            nk = nk.replace('proj.0.', 'proj.')
        out[nk] = nv
    return out


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('model', choices=['pcpvt', 'svt'])
    a = p.parse_args(args)
    import torch
    ckpt = torch.load(a.src, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt.get('model', ckpt))
    out = convert_twins(sd, a.model)
    os.makedirs(osp.dirname(osp.abspath(a.dst)), exist_ok=True)
    torch.save(out, a.dst)
    print(f'{len(out)} tensors -> {a.dst}')


if __name__ == '__main__':
    main()
