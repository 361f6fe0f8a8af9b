#!/usr/bin/env python
"""Pack image directories into mmap blobs for decode-free loading.

    python tools/pack_dataset.py data/Potsdam_IRRG_1024 --recursive
    python tools/pack_dataset.py data/X/img_dir/train data/X/ann_dir/train

Each directory gets ``.pfst_pack.bin`` (flat pixel blob) +
``.pfst_pack.json`` (name -> offset/shape/dtype).  ``imread`` then
serves those files from the mmap instead of decoding PNG/TIFF per
sample — the dominant host cost of the train loader on large corpora
(see PERF.md).  Re-run after changing a directory's contents; unpacked
files fall back to normal decode.
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def parse_args(args=None):
    p = argparse.ArgumentParser(
        description='Pack image dirs into mmap blobs')
    p.add_argument('dirs', nargs='+', help='directories of images')
    p.add_argument('-r', '--recursive', action='store_true',
                   help='descend into subdirectories')
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    from pfst_tpu.datasets.pipelines.packing import (IMAGE_EXTS,
                                                     pack_directory)
    targets = []
    for d in args.dirs:
        if args.recursive:
            for root, _, files in os.walk(d):
                if any(f.lower().endswith(IMAGE_EXTS) for f in files):
                    targets.append(root)
        else:
            targets.append(d)
    total = 0
    for d in sorted(set(targets)):
        n = pack_directory(d)
        total += n
        print(f'{d}: packed {n} images')
    print(f'total: {total} images')
    return total


if __name__ == '__main__':
    main()
