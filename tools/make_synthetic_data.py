#!/usr/bin/env python
"""Generate a synthetic ISPRS-layout dataset for smoke/perf runs.

Creates ``{out}/img_dir/{train,val}`` and ``ann_dir`` with random RGB
tiles and blobby label maps (classes 0..num_classes; 0 acts as the
boundary class under reduce_zero_label), so the shipped PFST configs
run end-to-end without the real Potsdam/Vaihingen download.
"""
import argparse
import os
import os.path as osp

import cv2
import numpy as np


def blobby_labels(rs, size, num_classes):
    """low-frequency noise argmax -> contiguous class regions."""
    small = rs.rand(num_classes + 1, size // 32, size // 32)
    up = np.stack([
        cv2.resize(s, (size, size), interpolation=cv2.INTER_CUBIC)
        for s in small
    ])
    return up.argmax(0).astype(np.uint8)


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('-o', '--out', required=True)
    p.add_argument('--size', type=int, default=1024)
    p.add_argument('--num-train', type=int, default=8)
    p.add_argument('--num-val', type=int, default=2)
    p.add_argument('--num-classes', type=int, default=6)
    p.add_argument('--seed', type=int, default=0)
    a = p.parse_args(args)
    rs = np.random.RandomState(a.seed)
    for split, n in (('train', a.num_train), ('val', a.num_val)):
        os.makedirs(osp.join(a.out, 'img_dir', split), exist_ok=True)
        os.makedirs(osp.join(a.out, 'ann_dir', split), exist_ok=True)
        # class-correlated tint + noise: the labels are LEARNABLE
        # from the image, so training runs can demonstrate real
        # convergence (pure noise images would cap at class priors)
        palette = np.linspace(40, 215, a.num_classes + 1)[:, None] \
            * np.array([[1.0, 0.7, 1.3]])
        for i in range(n):
            ann = blobby_labels(rs, a.size, a.num_classes)
            noise = rs.randint(0, 255, (a.size, a.size, 3))
            tint = palette[ann.astype(np.int64)]
            img = np.clip(0.5 * noise + 0.5 * tint, 0,
                          255).astype(np.uint8)
            cv2.imwrite(osp.join(a.out, 'img_dir', split,
                                 f't{i}.png'), img)
            cv2.imwrite(osp.join(a.out, 'ann_dir', split,
                                 f't{i}.png'), ann)
    print(f'synthetic dataset at {a.out}')


if __name__ == '__main__':
    main()
