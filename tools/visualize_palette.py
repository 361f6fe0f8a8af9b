"""Render per-class palette swatches to PNG files (counterpart of
``tools/visualize_palette.py``: dumps one HxW color strip per class so
figures/legends can reference dataset colors).

Usage::

    python tools/visualize_palette.py --dataset ISPRSDataset \
        -o work_dirs/color_palette/isprs
    python tools/visualize_palette.py --num-classes 33 \
        -o work_dirs/color_palette/season_net
"""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def tab_palette(n):
    """matplotlib tab20+tab20b colors without importing matplotlib."""
    import matplotlib.cm as cm
    p1 = cm.get_cmap('tab20')
    p2 = cm.get_cmap('tab20b')
    colors = [p1(i / 20) for i in range(20)] + \
        [p2(i / 20) for i in range(20)]
    return (np.array(colors)[:n, :3] * 255).astype(np.uint8).tolist()


def parse_args(args=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--dataset', default=None,
                   help='registered dataset class whose PALETTE to use')
    p.add_argument('--num-classes', type=int, default=33,
                   help='swatch count for the generic tab palette')
    p.add_argument('-o', '--out-dir', required=True)
    p.add_argument('--height', type=int, default=20)
    p.add_argument('--width', type=int, default=100)
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    if args.dataset:
        from pfst_tpu.datasets.builder import DATASETS
        cls = DATASETS.get(args.dataset)
        palette = cls.PALETTE
        names = list(cls.CLASSES)
    else:
        try:
            palette = tab_palette(args.num_classes)
        except ImportError:
            rs = np.random.RandomState(0)
            palette = rs.randint(0, 255, (args.num_classes, 3)).tolist()
        names = [str(i) for i in range(len(palette))]
    os.makedirs(args.out_dir, exist_ok=True)
    for i, color in enumerate(palette):
        mat = np.tile(np.asarray(color, np.uint8)[None, None],
                      (args.height, args.width, 1))
        path = osp.join(args.out_dir, f'color_palette_{i}.png')
        cv2.imwrite(path, mat[:, :, ::-1])  # RGB -> BGR for imwrite
    print(f'{len(palette)} swatches -> {args.out_dir} '
          f'({", ".join(names[:6])}{"..." if len(names) > 6 else ""})')


if __name__ == '__main__':
    main()
