#!/usr/bin/env python
"""ISPRS Potsdam / Vaihingen tile clipper.

Capability mirror of /root/reference/tools/convert_datasets/potsdam.py
and vaihingen.py: unzip (or read) the big ISPRS tiles, map the RGB
label palette to class indices, grid-clip to ``clip_size`` with
``stride_size`` overlap and write the fixed train/val tile splits under
``{out_dir}/{img_dir,ann_dir}/{train,val}``.

The palette->index mapping encodes each RGB triple as a single scalar
dot-product key, identical class order to the reference:
0 clutter-ish boundary, then the 6 ISPRS classes (the on-disk indices
are +1 so that ``reduce_zero_label`` recovers 0..5 at load time).

Usage:
  python tools/convert_datasets/isprs.py potsdam <dataset_path> \
      -o data/Potsdam_IRRG_1024 --clip_size 1024 --stride_size 512
"""
import argparse
import glob
import math
import os
import os.path as osp
import sys
import zipfile

import cv2
import numpy as np

POTSDAM_SPLITS = {
    'train': [
        '2_10', '2_11', '2_12', '3_10', '3_11', '3_12', '4_10', '4_11',
        '4_12', '5_10', '5_11', '5_12', '6_10', '6_11', '6_12', '6_7',
        '6_8', '6_9', '7_10', '7_11', '7_12', '7_7', '7_8', '7_9'
    ],
    'val': [
        '5_15', '6_15', '6_13', '3_13', '4_14', '6_14', '5_14', '2_13',
        '4_15', '2_14', '5_13', '4_13', '3_14', '7_13'
    ]
}
VAIHINGEN_SPLITS = {
    'train': [
        'area1', 'area11', 'area13', 'area15', 'area17', 'area21',
        'area23', 'area26', 'area28', 'area3', 'area30', 'area32',
        'area34', 'area37', 'area5', 'area7'
    ],
    'val': [
        'area6', 'area24', 'area35', 'area16', 'area14', 'area22',
        'area10', 'area4', 'area2', 'area20', 'area8', 'area31',
        'area33', 'area27', 'area38', 'area12', 'area29'
    ]
}

# BGR colors as read by cv2; class order mirrors the reference mapping
# BGR rows, matching cv2/mmcv imread order — the reference's
# ``potsdam.py:74-76`` table IS already BGR (mmcv.imread default).
# ISPRS semantics: building is RGB blue -> BGR [255,0,0]; clutter is
# RGB red -> BGR [0,0,255].
COLOR_MAP = np.array([
    [0, 0, 0],         # 0: boundary/undefined -> ignored after reduce
    [255, 255, 255],   # impervious surface (white)
    [255, 0, 0],       # building (RGB blue)
    [255, 255, 0],     # low vegetation (RGB cyan)
    [0, 255, 0],       # tree (green)
    [0, 255, 255],     # car (RGB yellow)
    [0, 0, 255],       # clutter (RGB red)
])


def grid_boxes(h, w, clip, stride):
    """All clip windows covering the tile (right/bottom aligned)."""
    xs = list(range(0, max(w - clip, 0) + 1, stride))
    ys = list(range(0, max(h - clip, 0) + 1, stride))
    if xs[-1] + clip < w:
        xs.append(w - clip)
    if ys[-1] + clip < h:
        ys.append(h - clip)
    boxes = []
    for y in ys:
        for x in xs:
            boxes.append((x, y, min(x + clip, w), min(y + clip, h)))
    return boxes


def rgb_label_to_index(image):
    h, w, c = image.shape
    key = np.array([2, 3, 4])
    flat = image.reshape(-1, c) @ key
    out = np.zeros_like(flat)
    for idx, color in enumerate(COLOR_MAP):
        out[flat == color @ key] = idx
    return out.reshape(h, w).astype(np.uint8)


def clip_one(image_path, save_dir, clip, stride, to_label, tile_id):
    image = cv2.imread(image_path, cv2.IMREAD_COLOR)
    h, w = image.shape[:2]
    if to_label:
        image = rgb_label_to_index(image)
    for (x1, y1, x2, y2) in grid_boxes(h, w, clip, stride):
        patch = image[y1:y2, x1:x2]
        cv2.imwrite(
            osp.join(save_dir, f'{tile_id}_{x1}_{y1}_{x2}_{y2}.png'),
            patch)


def extract_zips(dataset_path, tmp_dir):
    for zipf in glob.glob(osp.join(dataset_path, '*.zip')):
        with zipfile.ZipFile(zipf) as zf:
            zf.extractall(tmp_dir)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('dataset', choices=['potsdam', 'vaihingen'])
    parser.add_argument('dataset_path')
    parser.add_argument('-o', '--out_dir', required=True)
    parser.add_argument('--clip_size', type=int, default=1024)
    parser.add_argument('--stride_size', type=int, default=512)
    parser.add_argument('--img-glob', default=None,
                        help='override glob for image tiles')
    parser.add_argument('--ann-glob', default=None,
                        help='override glob for label tiles')
    args = parser.parse_args()

    splits = POTSDAM_SPLITS if args.dataset == 'potsdam' \
        else VAIHINGEN_SPLITS
    for sub in ('img_dir/train', 'img_dir/val', 'ann_dir/train',
                'ann_dir/val'):
        os.makedirs(osp.join(args.out_dir, sub), exist_ok=True)

    img_glob = args.img_glob or osp.join(args.dataset_path, '**',
                                         '*.tif')
    candidates = sorted(glob.glob(img_glob, recursive=True))
    if not candidates:
        print(f'no tiles found under {img_glob}', file=sys.stderr)
        sys.exit(1)

    def tile_id_of(path):
        base = osp.splitext(osp.basename(path))[0]
        if args.dataset == 'potsdam':
            parts = base.split('_')
            return '_'.join(parts[2:4]) if len(parts) >= 4 else base
        for tok in base.split('_'):
            if tok.startswith('area'):
                return tok
        return base

    def split_of(tid):
        for split, ids in splits.items():
            if tid in ids:
                return split
        return None

    n = 0
    for path in candidates:
        tid = tile_id_of(path)
        split = split_of(tid)
        if split is None:
            continue
        is_label = 'label' in path.lower() or 'gt' in path.lower()
        sub = 'ann_dir' if is_label else 'img_dir'
        clip_one(path, osp.join(args.out_dir, sub, split),
                 args.clip_size, args.stride_size, is_label, tid)
        n += 1
        print(f'clipped {path} -> {sub}/{split}')
    print(f'done: {n} tiles clipped into {args.out_dir}')


if __name__ == '__main__':
    main()
