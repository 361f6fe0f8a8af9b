#!/usr/bin/env python
"""Rename an official STDC1/STDC2 checkpoint to mmseg-style keys
(reference ``tools/model_converters/stdc2mmseg.py``).

Pure rename pass; the flax-side layout conversion for STDCNet is not
yet wired into ``convert_torch_checkpoint.py``.
"""
import argparse
import os
import os.path as osp

STAGES = {
    'STDC1': ['0', '1', '2.0', '2.1', '3.0', '3.1', '4.0', '4.1'],
    'STDC2': ['0', '1', '2.0', '2.1', '2.2', '2.3', '3.0', '3.1',
              '3.2', '3.3', '3.4', '4.0', '4.1', '4.2'],
}


def convert_stdc(sd, stdc_type: str):
    stages = STAGES[stdc_type]
    out = {}
    for ori_k, v in sd.items():
        k = ori_k.replace('cp.', '')
        keep = False
        if 'features.' in k:
            n = int(k.split('.')[1])
            k = k.replace(f'features.{n}.', f'stages.{stages[n]}.')
            keep = True
        if 'conv_list' in k:
            k = k.replace('conv_list', 'layers')
            keep = True
        if 'avd_layer.0' in k:
            k = k.replace('avd_layer.0', 'downsample.conv')
            keep = True
        elif 'avd_layer.1' in k:
            k = k.replace('avd_layer.1', 'downsample.bn')
            keep = True
        if keep:
            out[k] = v
    return out


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('type', choices=['STDC1', 'STDC2'])
    a = p.parse_args(args)
    import torch
    ckpt = torch.load(a.src, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt.get('model', ckpt))
    out = convert_stdc(sd, a.type)
    os.makedirs(osp.dirname(osp.abspath(a.dst)), exist_ok=True)
    torch.save(out, a.dst)
    print(f'{len(out)} tensors -> {a.dst}')


if __name__ == '__main__':
    main()
