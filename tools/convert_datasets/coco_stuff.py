#!/usr/bin/env python
"""Prepare COCO-Stuff 10k / 164k annotations as trainId PNGs.

One CLI covering both reference scripts
(``tools/convert_datasets/coco_stuff10k.py`` and
``coco_stuff164k.py``).  Their giant literal clsID→trainID tables
follow a single rule — remove the 11 COCO thing classes that have no
annotations and renumber the remainder contiguously — so the lookup
tables are derived here instead of inlined, and the per-image remap is
one vectorized ``np.take`` instead of 172 boolean-mask passes.

164k layout in:  ``<path>/images/{train2017,val2017}/*.jpg`` +
``<path>/annotations/{train2017,val2017}/*.png`` (labelIds 0-181,
255 = unlabeled) → writes ``*_labelTrainIds.png`` next to each mask.

10k layout in:  ``<path>/images/*.jpg`` + ``<path>/annotations/*.mat``
(matlab ``S`` field, labels 1-182, 0 = unlabeled) +
``<path>/imageLists/{train,test}.txt`` → writes
``images/{train2014,test2014}`` and ``annotations/{train2014,test2014}``.

Usage::

    python tools/convert_datasets/coco_stuff.py 164k <coco_path> [-o out]
    python tools/convert_datasets/coco_stuff.py 10k  <coco_path> [-o out]
"""
import argparse
import os
import os.path as osp
import shutil
from glob import glob
from multiprocessing import Pool

import cv2
import numpy as np

# COCO ids (0-based, 164k numbering) without stuff annotations; the
# reference tables renumber around exactly these.
_UNANNOTATED_164K = frozenset(
    {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90})


def _lookup_table(variant: str) -> np.ndarray:
    """256-entry uint8 table: raw label value → trainId."""
    table = np.arange(256, dtype=np.uint8)  # unmapped ids pass through
    if variant == '164k':
        next_id = 0
        for cls_id in range(182):
            if cls_id in _UNANNOTATED_164K:
                continue
            table[cls_id] = next_id
            next_id += 1
        table[255] = 255
    else:  # 10k: .mat labels are the 164k ids shifted +1, 0=unlabeled
        next_id = 0
        for cls_id in range(183):
            if cls_id - 1 in _UNANNOTATED_164K:
                continue
            table[cls_id] = next_id
            next_id += 1
    return table


def _remap_and_save(mask: np.ndarray, table: np.ndarray,
                    out_path: str) -> None:
    out = np.take(table, mask.astype(np.int64).clip(0, 255))
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    assert cv2.imwrite(out_path, out.astype(np.uint8)), out_path


def _convert_164k_mask(task):
    mask_path, table = task
    mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
    out_path = mask_path.rsplit('.', 1)[0] + '_labelTrainIds.png'
    _remap_and_save(mask, table, out_path)


def _convert_10k_item(task):
    (name, coco_path, out_dir, split, table) = task
    from scipy.io import loadmat
    shutil.copyfile(
        osp.join(coco_path, 'images', name + '.jpg'),
        osp.join(out_dir, 'images', split, name + '.jpg'))
    mat = loadmat(osp.join(coco_path, 'annotations', name + '.mat'))
    mask = mat['S'].astype(np.uint8)
    _remap_and_save(
        mask, table,
        osp.join(out_dir, 'annotations', split,
                 name + '_labelTrainIds.png'))


def convert_164k(coco_path, out_dir, nproc=1):
    out_dir = out_dir or coco_path
    if out_dir != coco_path:
        shutil.copytree(osp.join(coco_path, 'images'),
                        osp.join(out_dir, 'images'), dirs_exist_ok=True)
        shutil.copytree(osp.join(coco_path, 'annotations'),
                        osp.join(out_dir, 'annotations'),
                        dirs_exist_ok=True)
    table = _lookup_table('164k')
    masks = []
    for split in ('train2017', 'val2017'):
        masks += [
            m for m in sorted(
                glob(osp.join(out_dir, 'annotations', split, '*.png')))
            if '_labelTrainIds' not in m
        ]
    tasks = [(m, table) for m in masks]
    if nproc > 1:
        with Pool(nproc) as pool:
            pool.map(_convert_164k_mask, tasks)
    else:
        for t in tasks:
            _convert_164k_mask(t)
    print(f'Converted {len(masks)} masks')


def convert_10k(coco_path, out_dir, nproc=1):
    out_dir = out_dir or coco_path
    table = _lookup_table('10k')
    tasks = []
    for list_name, split in (('train', 'train2014'), ('test',
                                                      'test2014')):
        os.makedirs(osp.join(out_dir, 'images', split), exist_ok=True)
        os.makedirs(osp.join(out_dir, 'annotations', split),
                    exist_ok=True)
        with open(osp.join(coco_path, 'imageLists',
                           f'{list_name}.txt')) as f:
            names = [line.strip() for line in f if line.strip()]
        tasks += [(n, coco_path, out_dir, split, table) for n in names]
    if nproc > 1:
        with Pool(nproc) as pool:
            pool.map(_convert_10k_item, tasks)
    else:
        for t in tasks:
            _convert_10k_item(t)
    print(f'Converted {len(tasks)} images')


def parse_args(args=None):
    p = argparse.ArgumentParser(
        description='Convert COCO-Stuff annotations to trainIds')
    p.add_argument('variant', choices=('10k', '164k'))
    p.add_argument('coco_path', help='coco stuff path')
    p.add_argument('-o', '--out_dir', default=None)
    p.add_argument('--nproc', default=1, type=int)
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    if args.variant == '164k':
        convert_164k(args.coco_path, args.out_dir, args.nproc)
    else:
        convert_10k(args.coco_path, args.out_dir, args.nproc)


if __name__ == '__main__':
    main()
