#!/usr/bin/env python
"""Prepare the LoveDA dataset (mirror of the reference
``tools/convert_datasets/loveda.py``).

Unpacks ``Train.zip`` / ``Val.zip`` / ``Test.zip`` and lays the
Rural+Urban images/masks out as::

    out_dir/img_dir/{train,val,test}/*.png
    out_dir/ann_dir/{train,val}/*.png

Usage: python tools/convert_datasets/loveda.py <path> -o data/loveDA
"""
import argparse
import os
import os.path as osp
import shutil
import tempfile
import zipfile


def parse_args(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('dataset_path', help='folder holding the 3 zips')
    p.add_argument('--tmp_dir', default=None)
    p.add_argument('-o', '--out_dir', default=osp.join('data', 'loveDA'))
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    out_dir = args.out_dir
    for split in ('train', 'val', 'test'):
        os.makedirs(osp.join(out_dir, 'img_dir', split), exist_ok=True)
    for split in ('train', 'val'):
        os.makedirs(osp.join(out_dir, 'ann_dir', split), exist_ok=True)

    for name in ('Train.zip', 'Val.zip', 'Test.zip'):
        assert name in os.listdir(args.dataset_path), \
            f'{name} is not in {args.dataset_path}'

    with tempfile.TemporaryDirectory(dir=args.tmp_dir) as tmp:
        for split in ('Train', 'Val', 'Test'):
            with zipfile.ZipFile(osp.join(args.dataset_path,
                                          split + '.zip')) as zf:
                zf.extractall(tmp)
            mode = split.lower()
            for location in ('Rural', 'Urban'):
                for kind, sub in (('images_png', 'img_dir'),
                                  ('masks_png', 'ann_dir')):
                    if split == 'Test' and kind == 'masks_png':
                        continue
                    src = osp.join(tmp, split, location, kind)
                    if not osp.isdir(src):
                        continue
                    dst = osp.join(out_dir, sub, mode)
                    for f in os.listdir(src):
                        shutil.move(osp.join(src, f), osp.join(dst, f))
    print(f'LoveDA prepared under {out_dir}')


if __name__ == '__main__':
    main()
