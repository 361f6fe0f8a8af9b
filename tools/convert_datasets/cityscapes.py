#!/usr/bin/env python
"""Prepare Cityscapes: rasterize ``*_gtFine_polygons.json`` to
``*_gtFine_labelTrainIds.png`` and emit split files.

Mirrors the workflow of the reference
``tools/convert_datasets/cityscapes.py`` (which shells out to
``cityscapesscripts.preparation.json2labelImg``); here the polygon
rasterization is self-contained (cv2.fillPoly) so no external
cityscapesscripts dependency is needed.

Usage::

    python tools/convert_datasets/cityscapes.py data/cityscapes \
        [--gt-dir gtFine] [-o out_dir] [--nproc 8]
"""
import argparse
import json
import os
import os.path as osp
from multiprocessing import Pool

import cv2
import numpy as np

# (name, trainId) for the standard 19-class Cityscapes protocol; every
# name not listed rasterizes as ignore (255).  ``<name>group`` labels
# fall back to ``<name>`` (cityscapesscripts name2label semantics).
NAME_TO_TRAIN_ID = {
    'road': 0, 'sidewalk': 1, 'building': 2, 'wall': 3, 'fence': 4,
    'pole': 5, 'traffic light': 6, 'traffic sign': 7, 'vegetation': 8,
    'terrain': 9, 'sky': 10, 'person': 11, 'rider': 12, 'car': 13,
    'truck': 14, 'bus': 15, 'train': 16, 'motorcycle': 17,
    'bicycle': 18,
}
IGNORE = 255


def polygons_to_train_ids(ann: dict) -> np.ndarray:
    """Rasterize one polygons.json dict to a trainIds map.

    Objects are drawn in file order (later objects overdraw earlier
    ones) and ``deleted`` objects are skipped — matching
    ``json2labelImg``.
    """
    h, w = int(ann['imgHeight']), int(ann['imgWidth'])
    out = np.full((h, w), IGNORE, np.uint8)
    for obj in ann.get('objects', []):
        if obj.get('deleted'):
            continue
        name = obj['label']
        if name not in NAME_TO_TRAIN_ID and name.endswith('group'):
            name = name[:-len('group')]
        train_id = NAME_TO_TRAIN_ID.get(name, IGNORE)
        poly = np.asarray(obj['polygon'], np.int32).reshape(-1, 1, 2)
        cv2.fillPoly(out, [poly], int(train_id))
    return out


def convert_json_to_label(json_file: str) -> None:
    with open(json_file) as f:
        ann = json.load(f)
    label = polygons_to_train_ids(ann)
    label_file = json_file.replace('_polygons.json',
                                   '_labelTrainIds.png')
    assert cv2.imwrite(label_file, label), label_file


def _scan(gt_dir, suffix):
    found = []
    for dirpath, _, files in os.walk(gt_dir):
        for f in sorted(files):
            if f.endswith(suffix):
                found.append(osp.join(dirpath, f))
    return sorted(found)


def parse_args(args=None):
    p = argparse.ArgumentParser(
        description='Convert Cityscapes annotations to TrainIds')
    p.add_argument('cityscapes_path', help='cityscapes data path')
    p.add_argument('--gt-dir', default='gtFine', type=str)
    p.add_argument('-o', '--out-dir', help='output path')
    p.add_argument('--nproc', default=1, type=int)
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    out_dir = args.out_dir or args.cityscapes_path
    os.makedirs(out_dir, exist_ok=True)
    gt_dir = osp.join(args.cityscapes_path, args.gt_dir)

    poly_files = _scan(gt_dir, '_polygons.json')
    if args.nproc > 1:
        with Pool(args.nproc) as pool:
            pool.map(convert_json_to_label, poly_files)
    else:
        for f in poly_files:
            convert_json_to_label(f)

    for split in ('train', 'val', 'test'):
        split_dir = osp.join(gt_dir, split)
        names = []
        if osp.isdir(split_dir):
            names = [
                osp.basename(f).replace('_gtFine_polygons.json', '')
                for f in _scan(split_dir, '_polygons.json')
            ]
        with open(osp.join(out_dir, f'{split}.txt'), 'w') as f:
            f.writelines(n + '\n' for n in names)
    print(f'Converted {len(poly_files)} annotations')


if __name__ == '__main__':
    main()
