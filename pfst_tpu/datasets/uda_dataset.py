"""Source x target pairing dataset for UDA.

Mirror of ``rsiseg/datasets/uda_dataset.py:44-135``: ``__getitem__``
returns the source sample plus ``target_img``/``target_img_strong_aug``
/ ``target_img_metas``; length is ``len(source) * len(target)`` with
index split ``idx // len(target)``, ``idx % len(target)``.  Optional
rare-class sampling (RCS) draws the source image from a
temperature-softmax class distribution built from
``sample_class_stats.json`` (``uda_dataset.py:17-114``).
"""
from __future__ import annotations

import json
import os.path as osp

import numpy as np

from ..utils.logger import get_root_logger, print_log
from .builder import DATASETS


def get_rcs_class_probs(data_root, temperature):
    """(``uda_dataset.py:17-40``): rarer classes get higher probability."""
    with open(osp.join(data_root, 'sample_class_stats.json')) as f:
        sample_class_stats = json.load(f)
    overall = {}
    for s in sample_class_stats:
        s = dict(s)
        s.pop('file', None)
        for c, n in s.items():
            overall[int(c)] = overall.get(int(c), 0) + n
    overall = dict(sorted(overall.items(), key=lambda kv: kv[1]))
    freq = np.asarray(list(overall.values()), np.float64)
    freq = freq / freq.sum()
    freq = 1.0 - freq
    z = np.exp(freq / temperature)
    prob = z / z.sum()
    return list(overall.keys()), prob


@DATASETS.register_module()
class UDADataset:

    def __init__(self, source, target, cfg):
        self.source = source
        self.target = target
        self.ignore_index = target.ignore_index
        self.CLASSES = target.CLASSES
        self.PALETTE = target.PALETTE
        self.path2name = cfg.get('path2name', False)
        assert target.ignore_index == source.ignore_index
        assert tuple(target.CLASSES) == tuple(source.CLASSES)

        rcs_cfg = cfg.get('rare_class_sampling')
        self.rcs_enabled = rcs_cfg is not None
        if self.rcs_enabled:
            self.rcs_class_temp = rcs_cfg['class_temp']
            self.rcs_min_crop_ratio = rcs_cfg['min_crop_ratio']
            self.rcs_min_pixels = rcs_cfg['min_pixels']
            data_root = cfg['source'].get('rcs_root') or \
                cfg['source']['data_root']
            self.rcs_classes, self.rcs_classprob = get_rcs_class_probs(
                data_root, self.rcs_class_temp)
            print_log(f'RCS Classes: {self.rcs_classes}',
                      get_root_logger())
            with open(osp.join(data_root,
                               'samples_with_class.json')) as f:
                swc = json.load(f)
            swc = {int(k): v for k, v in swc.items()
                   if int(k) in self.rcs_classes}
            self.samples_with_class = {}
            for c in self.rcs_classes:
                self.samples_with_class[c] = [
                    file.split('/')[-1] for file, pixels in swc[c]
                    if pixels > self.rcs_min_pixels
                ]
                assert len(self.samples_with_class[c]) > 0
            self.file_to_idx = {}
            for i, dic in enumerate(self.source.img_infos):
                file = dic['ann']['seg_map']
                if self.path2name:
                    file = file.split('/')[-1]
                self.file_to_idx[file] = i

    def get_rare_class_sample(self):
        """(``uda_dataset.py:92-114``) class-balanced source draw with
        min-pixel re-crop loop."""
        c = np.random.choice(self.rcs_classes, p=self.rcs_classprob)
        f1 = np.random.choice(self.samples_with_class[c])
        i1 = self.file_to_idx[f1]
        s1 = self.source[i1]
        if self.rcs_min_crop_ratio > 0:
            for _ in range(10):
                n_class = int(np.sum(s1['gt_semantic_seg'] == c))
                if n_class > self.rcs_min_pixels * self.rcs_min_crop_ratio:
                    break
                s1 = self.source[i1]  # re-crop via the pipeline
        i2 = int(np.random.choice(len(self.target)))
        s2 = self.target[i2]
        return self._merge(s1, s2)

    @staticmethod
    def _merge(s1, s2):
        results = {**s1, 'target_img_metas': s2['img_metas'],
                   'target_img': s2['img']}
        if 'img_strong_aug' in s2:
            results['target_img_strong_aug'] = s2['img_strong_aug']
        if 'ori_img' in s2:
            results['target_img_ori'] = s2['ori_img']
            # the target view's recorded rot/flip drive the in-step
            # replay (PFSTV4); source metas of the same names would
            # clobber them, so copy explicitly from the target sample
            for k in ('rotate_k', 'flip_vertical', 'flip_horizontal'):
                if k in s2:
                    results[k] = s2[k]
        return results

    def __getitem__(self, idx):
        if self.rcs_enabled:
            return self.get_rare_class_sample()
        s1 = self.source[idx // len(self.target)]
        s2 = self.target[idx % len(self.target)]
        return self._merge(s1, s2)

    def __len__(self):
        return len(self.source) * len(self.target)
