#!/usr/bin/env python
"""Prepare the iSAID dataset (mirror of the reference
``tools/convert_datasets/isaid.py``).

Expects ``<path>/{train,val,test}/images/*.zip`` plus
``<path>/{train,val}/Semantic_masks/*.zip``.  Color masks decode to
index labels via the official 16-color palette; train/val tiles are
slide-cropped to ``patch`` squares with ``overlap`` (windows clamp to
the image border), labels pad with 255 and images with 0.

Usage: python tools/convert_datasets/isaid.py <path> -o data/iSAID
"""
import argparse
import glob
import os
import os.path as osp
import shutil
import tempfile
import zipfile

import cv2
import numpy as np

# official iSAID color -> index palette
PALETTE = [
    (0, 0, 0), (0, 0, 63), (0, 63, 63), (0, 63, 0), (0, 63, 127),
    (0, 63, 191), (0, 63, 255), (0, 127, 63), (0, 127, 127),
    (0, 0, 127), (0, 0, 191), (0, 0, 255), (0, 191, 127),
    (0, 127, 191), (0, 127, 255), (0, 100, 155),
]


def color_to_index(rgb):
    """(H,W,3) RGB mask -> (H,W) uint8 index labels."""
    out = np.zeros(rgb.shape[:2], np.uint8)
    for idx, color in enumerate(PALETTE):
        out[np.all(rgb == np.asarray(color), axis=2)] = idx
    return out


def _pad_to(arr, h, w, value):
    ph, pw = max(h - arr.shape[0], 0), max(w - arr.shape[1], 0)
    if ph == 0 and pw == 0:
        return arr
    widths = ((0, ph), (0, pw)) + ((0, 0),) * (arr.ndim - 2)
    return np.pad(arr, widths, constant_values=value)


def _windows(size, patch, stride):
    """Border-clamped slide windows (reference slide_crop_*), each
    distinct window exactly once: interior starts every ``stride``,
    plus one final window clamped to the border (iterating
    ``range(0, size, stride)`` instead would emit the clamped border
    window several times and rewrite the same crops)."""
    out = []
    for start in range(0, max(size - patch, 0) + 1, stride):
        out.append((start, start + patch))
    if out[-1][1] < size:
        out.append((max(size - patch, 0), size))
    return out


def slide_crop(arr, patch, overlap, pad_value):
    """Yield ((y0, y1, x0, x1), patch) windows."""
    arr = _pad_to(arr, patch, patch, pad_value)
    h, w = arr.shape[:2]
    stride = patch - overlap
    for x0, x1 in _windows(w, patch, stride):
        for y0, y1 in _windows(h, patch, stride):
            yield (y0, y1, x0, x1), arr[y0:y1, x0:x1]


def parse_args(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('dataset_path')
    p.add_argument('--tmp_dir', default=None)
    p.add_argument('-o', '--out_dir', default=osp.join('data', 'iSAID'))
    p.add_argument('--patch_width', type=int, default=896)
    p.add_argument('--patch_height', type=int, default=896)
    p.add_argument('--overlap_area', type=int, default=384)
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    assert args.patch_width == args.patch_height, \
        'square patches only (matches the reference tool)'
    patch, overlap = args.patch_width, args.overlap_area
    out_dir = args.out_dir
    for sub in ('img_dir', 'ann_dir'):
        for split in ('train', 'val', 'test'):
            os.makedirs(osp.join(out_dir, sub, split), exist_ok=True)
    for split in ('train', 'val', 'test'):
        assert osp.isdir(osp.join(args.dataset_path, split)), \
            f'{split} is not in {args.dataset_path}'

    with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
        for split in ('train', 'val', 'test'):
            for z in glob.glob(osp.join(args.dataset_path, split,
                                        'images', '*.zip')):
                with zipfile.ZipFile(z) as zf:
                    zf.extractall(osp.join(tmp, split, 'img'))
            for img_path in glob.glob(osp.join(tmp, split, 'img',
                                               'images', '*.png')):
                if split == 'test':
                    shutil.move(img_path,
                                osp.join(out_dir, 'img_dir', split))
                    continue
                img = cv2.imread(img_path, cv2.IMREAD_COLOR)
                stem = osp.basename(img_path).split('.')[0]
                for (y0, y1, x0, x1), pat in slide_crop(
                        img, patch, overlap, 0):
                    cv2.imwrite(
                        osp.join(out_dir, 'img_dir', split,
                                 f'{stem}_{y0}_{y1}_{x0}_{x1}.png'),
                        pat)
            if split == 'test':
                continue
            for z in glob.glob(osp.join(args.dataset_path, split,
                                        'Semantic_masks', '*.zip')):
                with zipfile.ZipFile(z) as zf:
                    zf.extractall(osp.join(tmp, split, 'lab'))
            for lab_path in glob.glob(osp.join(tmp, split, 'lab',
                                               'images', '*.png')):
                bgr = cv2.imread(lab_path, cv2.IMREAD_COLOR)
                label = color_to_index(bgr[..., ::-1])
                stem = osp.basename(lab_path).split('.')[0].split(
                    '_')[0]
                for (y0, y1, x0, x1), pat in slide_crop(
                        label, patch, overlap, 255):
                    name = (f'{stem}_{y0}_{y1}_{x0}_{x1}'
                            '_instance_color_RGB.png')
                    cv2.imwrite(
                        osp.join(out_dir, 'ann_dir', split, name), pat)
    print(f'iSAID prepared under {out_dir}')


if __name__ == '__main__':
    main()
