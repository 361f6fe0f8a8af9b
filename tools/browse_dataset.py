#!/usr/bin/env python
"""Render pipeline outputs for visual inspection
(mirror of /root/reference/tools/browse_dataset.py)."""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np

from pfst_tpu.utils import Config, DictAction


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--output-dir', default='work_dirs/browse')
    p.add_argument('--num', type=int, default=8)
    p.add_argument('--opacity', type=float, default=0.5)
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    a = p.parse_args(args)
    cfg = Config.fromfile(a.config)
    if a.cfg_options:
        cfg.merge_from_dict(a.cfg_options)

    import cv2
    from pfst_tpu.datasets import build_dataset
    ds = build_dataset(cfg.data['train'])
    palette = np.array(ds.PALETTE or [[0, 0, 0]], np.uint8)
    os.makedirs(a.output_dir, exist_ok=True)
    for i in range(min(a.num, len(ds))):
        s = ds[i]
        img = s['img']
        lo, hi = img.min(), img.max()
        img8 = ((img - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
        gt = s['gt_semantic_seg']
        color = np.zeros_like(img8)
        valid = gt < len(palette)
        color[valid] = palette[gt[valid]]
        overlay = (img8 * (1 - a.opacity) +
                   color * a.opacity).astype(np.uint8)
        cv2.imwrite(osp.join(a.output_dir, f'sample_{i}.png'),
                    np.concatenate([img8, overlay], axis=1))
    print(f'wrote {min(a.num, len(ds))} samples to {a.output_dir}')


if __name__ == '__main__':
    main()
