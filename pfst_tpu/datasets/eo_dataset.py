"""EODataset: feeder-backed dataset (Dataset4EO-equivalent).

The reference's ``EODataset`` (``rsiseg/datasets/custom.py:22-375``)
materialises sample records from external **Dataset4EO** datapipes.
This TPU-native build replaces the external dependency with a small
in-repo *feeder registry*: a feeder scans a concrete on-disk layout and
yields ``img_infos`` records with absolute paths plus CLASSES/PALETTE.

Built-in feeders:
* ``inria_clipped`` — pre-clipped Inria aerial building patches grouped
  by city; ``datapipe_cfg=dict(city_names=[...])`` filters cities
  (mirrors ``configs/_base_/datasets/inria_da.py``).
* ``season_net`` — SeasonNet RGB uint16 TIFF grid patches grouped by
  season; ``datapipe_cfg=dict(seasons=[...])``.

Custom feeders register with ``@EO_FEEDERS.register_module()`` and
return ``(img_infos, classes, palette)``.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import List, Optional

from ..utils.registry import Registry
from .builder import DATASETS
from .custom import CustomDataset, scandir

EO_FEEDERS = Registry('eo_feeders')

_IMG_EXTS = ('.png', '.jpg', '.jpeg', '.tif', '.tiff')


def _scan_pairs(img_root: str, ann_root: Optional[str],
                name_filter=None) -> List[dict]:
    infos = []
    for name in scandir(img_root, recursive=True):
        if not name.lower().endswith(_IMG_EXTS):
            continue
        if name_filter is not None and not name_filter(name):
            continue
        info = dict(filename=osp.join(img_root, name))
        if ann_root is not None:
            stem = osp.splitext(name)[0]
            for ext in _IMG_EXTS:
                cand = osp.join(ann_root, stem + ext)
                if osp.exists(cand):
                    info['ann'] = dict(seg_map=cand)
                    break
        infos.append(info)
    return infos


@EO_FEEDERS.register_module(name='inria_clipped')
def inria_clipped(root, split='train', city_names=None, **kw):
    base = osp.join(root, 'Inria_clipped') if \
        osp.exists(osp.join(root, 'Inria_clipped')) else root
    img_root = osp.join(base, split, 'images')
    ann_root = osp.join(base, split, 'gt')
    if not osp.exists(ann_root):
        ann_root = None
    flt = None
    if city_names:
        flt = lambda n: any(osp.basename(n).startswith(c)  # noqa: E731
                            for c in city_names)
    infos = _scan_pairs(img_root, ann_root, flt)
    classes = ('background', 'building')
    palette = [[0, 0, 0], [255, 255, 255]]
    return infos, classes, palette


SEASON_NET_CLASSES = tuple(f'class_{i}' for i in range(33))


@EO_FEEDERS.register_module(name='season_net')
def season_net(root, split='train', seasons=None, **kw):
    img_root = osp.join(root, split, 'images')
    ann_root = osp.join(root, split, 'labels')
    if not osp.exists(ann_root):
        ann_root = None
    flt = None
    if seasons:
        flt = lambda n: any(s in n for s in seasons)  # noqa: E731
    infos = _scan_pairs(img_root, ann_root, flt)
    import numpy as np
    palette = np.random.RandomState(7).randint(
        0, 255, size=(33, 3)).tolist()
    return infos, SEASON_NET_CLASSES, palette


@DATASETS.register_module()
class EODataset(CustomDataset):

    def __init__(self, pipeline, datapipe, data_root=None, split='train',
                 datapipe_cfg=None, classes=None, palette=None, **kwargs):
        self.datapipe = datapipe
        self.datapipe_cfg = dict(datapipe_cfg or {})
        self._split_name = split
        feeder = EO_FEEDERS.get(datapipe)
        if feeder is None:
            raise KeyError(f'unknown EO feeder {datapipe}; register it '
                           f'in pfst_tpu/datasets/eo_dataset.py')
        infos, feed_classes, feed_palette = feeder(
            data_root, split=split, **self.datapipe_cfg)
        self._feeder_infos = infos
        kwargs.setdefault('img_suffix', '.png')
        kwargs.setdefault('seg_map_suffix', '.png')
        super().__init__(pipeline, img_dir='', ann_dir='',
                         data_root=None, split=None,
                         classes=classes, palette=palette, **kwargs)
        if self.CLASSES is None:
            self.CLASSES = feed_classes
        if self.PALETTE is None:
            self.PALETTE = feed_palette

    def load_annotations(self, *args, **kwargs):
        return self._feeder_infos

    def pre_pipeline(self, results):
        results['seg_fields'] = []
        results['img_prefix'] = None
        results['seg_prefix'] = None
        if self.custom_classes:
            results['label_map'] = self.label_map

    def get_gt_seg_map_by_idx(self, index):
        import numpy as np
        from .pipelines.loading import imread
        info = self.img_infos[index]
        gt = imread(info['ann']['seg_map'], unchanged=True)
        if gt.ndim == 3:
            gt = gt[..., 0]
        # custom-classes remap BEFORE reduce_zero, like the base
        # CustomDataset getter — skipping it would score predictions
        # (remapped id space) against raw gt ids
        if self.label_map is not None:
            out = gt.copy()
            for old_id, new_id in self.label_map.items():
                out[gt == old_id] = new_id
            gt = out
        if self.gt_loader_reduce_zero:
            gt = gt.astype(np.int32)
            gt[gt == 0] = 255
            gt = gt - 1
            gt[gt == 254] = 255
        return gt.astype(np.int32)
