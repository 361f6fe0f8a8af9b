#!/usr/bin/env python
"""PASCAL VOC 2012 + SBD "aug" annotations -> mmseg layout.

Torch/mmcv-free rewrite of the reference
``tools/convert_datasets/voc_aug.py``: converts the SBD ``.mat``
class masks to index pngs in ``SegmentationClassAug`` and writes the
``trainaug.txt`` / ``aug.txt`` split lists with the same
set-arithmetic and length asserts.
"""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np
from scipy.io import loadmat

AUG_LEN = 10582


def convert_mat(mat_file, in_dir, out_dir):
    data = loadmat(osp.join(in_dir, mat_file))
    mask = data['GTcls'][0]['Segmentation'][0].astype(np.uint8)
    out = osp.join(out_dir, mat_file.replace('.mat', '.png'))
    assert cv2.imwrite(out, mask), out


def generate_aug_list(merged_list, excluded_list):
    return sorted(set(merged_list) - set(excluded_list))


def main(args=None):
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('devkit_path', help='pascal voc devkit path')
    p.add_argument('aug_path', help='SBD (benchmark_RELEASE) path')
    p.add_argument('-o', '--out-dir', default=None)
    a = p.parse_args(args)

    out_dir = a.out_dir or osp.join(a.devkit_path, 'VOC2012',
                                    'SegmentationClassAug')
    os.makedirs(out_dir, exist_ok=True)
    in_dir = osp.join(a.aug_path, 'dataset', 'cls')
    mats = sorted(n for n in os.listdir(in_dir) if n.endswith('.mat'))
    for n in mats:
        convert_mat(n, in_dir, out_dir)

    def read_list(path):
        with open(path) as f:
            return [line.strip() for line in f if line.strip()]

    full_aug_list = (read_list(osp.join(a.aug_path, 'dataset',
                                        'train.txt')) +
                     read_list(osp.join(a.aug_path, 'dataset',
                                        'val.txt')))
    seg_sets = osp.join(a.devkit_path, 'VOC2012', 'ImageSets',
                        'Segmentation')
    ori_train_list = read_list(osp.join(seg_sets, 'train.txt'))
    val_list = read_list(osp.join(seg_sets, 'val.txt'))

    aug_train_list = generate_aug_list(ori_train_list + full_aug_list,
                                       val_list)
    assert len(aug_train_list) == AUG_LEN, len(aug_train_list)
    with open(osp.join(seg_sets, 'trainaug.txt'), 'w') as f:
        f.writelines(line + '\n' for line in aug_train_list)

    aug_list = generate_aug_list(full_aug_list,
                                 ori_train_list + val_list)
    assert len(aug_list) == AUG_LEN - len(ori_train_list), \
        len(aug_list)
    with open(osp.join(seg_sets, 'aug.txt'), 'w') as f:
        f.writelines(line + '\n' for line in aug_list)
    print('Done!')
    return 0


if __name__ == '__main__':
    sys.exit(main())
