#!/usr/bin/env python
"""Precompute rare-class-sampling statistics for a dataset
(standalone form of ``RareClassSamplingHook``,
reference ``rsiseg/core/hook/rare_class_sampling_hook.py:31-60``)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from pfst_tpu.utils import Config, DictAction


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--split', default='train')
    p.add_argument('--branch', default='source',
                   choices=['source', 'target', 'flat'])
    p.add_argument('-o', '--out-dir', default=None)
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    a = p.parse_args(args)
    cfg = Config.fromfile(a.config)
    if a.cfg_options:
        cfg.merge_from_dict(a.cfg_options)

    from pfst_tpu.core.hooks.rare_class_sampling_hook import \
        compute_class_stats
    from pfst_tpu.datasets import build_dataset

    node = cfg.data[a.split]
    if a.branch in node:
        node = node[a.branch]
    ds = build_dataset(node)
    out_dir = a.out_dir or ds.data_root or '.'
    compute_class_stats(ds, out_dir)


if __name__ == '__main__':
    main()
