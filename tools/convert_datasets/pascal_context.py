#!/usr/bin/env python
"""PASCAL-Context (VOC2010 + trainval_merged.json) -> mmseg layout.

Torch/mmcv-free rewrite of the reference
``tools/convert_datasets/pascal_context.py``: same 60-class mapping,
the same ``SegmentationClassContext`` pngs and split lists.  The mask
source is the `detail-api` (``pip install detail``), which the
reference also requires and which is NOT bundled here — the import is
deferred so the module stays importable (and the mapping testable)
without it.
"""
import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

_mapping = np.sort(
    np.array([
        0, 2, 259, 260, 415, 324, 9, 258, 144, 18, 19, 22, 23, 397, 25,
        284, 158, 159, 416, 33, 162, 420, 454, 295, 296, 427, 44, 45,
        46, 308, 59, 440, 445, 31, 232, 65, 354, 424, 68, 326, 72, 458,
        34, 207, 80, 355, 85, 347, 220, 349, 360, 98, 187, 104, 105,
        366, 189, 368, 113, 115
    ]))
_key = np.arange(len(_mapping)).astype('uint8')


def class_to_index(mask):
    """Raw detail-api class ids -> contiguous 0..59 indices."""
    values = np.unique(mask)
    for v in values:
        assert v in _mapping, f'unexpected class id {v}'
    index = np.digitize(mask.ravel(), _mapping, right=True)
    return _key[index].reshape(mask.shape)


def generate_labels(img_id, detail, out_dir):
    mask = class_to_index(detail.getMask(img_id))
    filename = img_id['file_name']
    out = osp.join(out_dir, filename.replace('jpg', 'png'))
    assert cv2.imwrite(out, mask), out
    return osp.splitext(osp.basename(filename))[0]


def main(args=None):
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('devkit_path', help='pascal voc devkit path')
    p.add_argument('json_path', help='trainval_merged.json path')
    p.add_argument('-o', '--out-dir', default=None)
    a = p.parse_args(args)

    try:
        from detail import Detail
    except ImportError:
        sys.exit('pascal_context conversion needs the detail-api '
                 '(`pip install detail`), same as the reference '
                 'converter; it is not bundled in this environment.')

    out_dir = a.out_dir or osp.join(a.devkit_path, 'VOC2010',
                                    'SegmentationClassContext')
    os.makedirs(out_dir, exist_ok=True)
    img_dir = osp.join(a.devkit_path, 'VOC2010', 'JPEGImages')
    sets_dir = osp.join(a.devkit_path, 'VOC2010', 'ImageSets',
                        'SegmentationContext')
    os.makedirs(sets_dir, exist_ok=True)

    for split in ('train', 'val'):
        detail = Detail(a.json_path, img_dir, split)
        names = sorted(
            generate_labels(i, detail, out_dir)
            for i in detail.getImgs())
        with open(osp.join(sets_dir, f'{split}.txt'), 'w') as f:
            f.writelines(line + '\n' for line in names)
    print('Done!')
    return 0


if __name__ == '__main__':
    sys.exit(main())
