#!/usr/bin/env python
"""Print the fully-merged config
(mirror of /root/reference/tools/print_config.py)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from pfst_tpu.utils import Config, DictAction


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    a = p.parse_args(args)
    cfg = Config.fromfile(a.config)
    if a.cfg_options:
        cfg.merge_from_dict(a.cfg_options)
    print(cfg.dump())


if __name__ == '__main__':
    main()
