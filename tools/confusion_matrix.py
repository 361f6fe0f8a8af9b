#!/usr/bin/env python
"""Confusion matrix from saved predictions or a checkpoint
(mirror of /root/reference/tools/confusion_matrix.py)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np

from pfst_tpu.utils import Config, DictAction


def parse_args(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('save_dir', nargs='?', default=None)
    p.add_argument('--show', action='store_true')
    p.add_argument('--color-theme', default='winter')
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    return p.parse_args(args)


def calculate_confusion_matrix(dataset, results):
    n = len(dataset.CLASSES)
    confusion = np.zeros((n, n), dtype=np.float64)
    for idx, pred in enumerate(results):
        gt = dataset.get_gt_seg_map_by_idx(idx)
        valid = gt != dataset.ignore_index
        inds = n * gt[valid].astype(np.int64) + pred[valid].astype(
            np.int64)
        confusion += np.bincount(inds, minlength=n**2).reshape(n, n)
    return confusion


def main(args=None):
    args = parse_args(args)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    from pfst_tpu.apis import single_gpu_test
    from pfst_tpu.core.checkpoint import extract_student, load_checkpoint
    from pfst_tpu.datasets import build_dataloader, build_dataset
    from pfst_tpu.models import build_segmentor

    dataset = build_dataset({**cfg.data['test'], 'test_mode': True})
    loader = build_dataloader(dataset, 1, 2, shuffle=False)
    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    variables = extract_student(load_checkpoint(args.checkpoint))
    results = single_gpu_test(model, variables, loader, pre_eval=False)

    confusion = calculate_confusion_matrix(dataset, results)
    row_sum = confusion.sum(axis=1, keepdims=True)
    norm = confusion / np.maximum(row_sum, 1) * 100
    print('Confusion matrix (% of gt row):')
    header = ' ' * 20 + ' '.join(f'{c[:8]:>9}' for c in dataset.CLASSES)
    print(header)
    for name, row in zip(dataset.CLASSES, norm):
        print(f'{name[:18]:>18}: ' + ' '.join(f'{v:9.2f}' for v in row))
    if args.save_dir:
        import os
        os.makedirs(args.save_dir, exist_ok=True)
        np.save(osp.join(args.save_dir, 'confusion.npy'), confusion)
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(8, 8))
            im = ax.imshow(norm, cmap=args.color_theme)
            ax.set_xticks(range(len(dataset.CLASSES)))
            ax.set_yticks(range(len(dataset.CLASSES)))
            ax.set_xticklabels(dataset.CLASSES, rotation=45,
                               ha='right')
            ax.set_yticklabels(dataset.CLASSES)
            fig.colorbar(im)
            fig.tight_layout()
            fig.savefig(osp.join(args.save_dir, 'confusion_matrix.png'))
        except Exception as e:
            print(f'plot skipped: {e}')
    return confusion


if __name__ == '__main__':
    main()
