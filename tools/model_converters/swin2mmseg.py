#!/usr/bin/env python
"""Rename an official SWIN release checkpoint to mmseg-style keys
(reference ``tools/model_converters/swin2mmseg.py``).

The renamed .pth can be consumed directly by
``tools/convert_torch_checkpoint.py`` (which also accepts the official
naming and applies this rename itself — this CLI exists for drop-in
workflow parity).
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

ARCH = 'swin'


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('src', help='official checkpoint path')
    p.add_argument('dst', help='output .pth path')
    a = p.parse_args(args)
    import torch

    from convert_torch_checkpoint import official_to_mmseg
    ckpt = torch.load(a.src, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt.get('model', ckpt))
    out = official_to_mmseg(sd, ARCH)
    os.makedirs(osp.dirname(osp.abspath(a.dst)), exist_ok=True)
    torch.save(out, a.dst)
    print(f'{len(out)} tensors -> {a.dst}')


if __name__ == '__main__':
    main()
