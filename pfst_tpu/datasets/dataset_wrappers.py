"""Dataset wrappers (mirror of ``rsiseg/datasets/dataset_wrappers.py``)."""
from __future__ import annotations

import bisect
from itertools import accumulate

import numpy as np

from .builder import DATASETS


@DATASETS.register_module()
class ConcatDataset:
    """(``dataset_wrappers.py:16``) with separate_eval support."""

    def __init__(self, datasets, separate_eval=True):
        self.datasets = list(datasets)
        self.separate_eval = separate_eval
        self.CLASSES = self.datasets[0].CLASSES
        self.PALETTE = getattr(self.datasets[0], 'PALETTE', None)
        self.ignore_index = getattr(self.datasets[0], 'ignore_index', 255)
        self.cumulative_sizes = list(
            accumulate(len(d) for d in self.datasets))

    def __len__(self):
        return self.cumulative_sizes[-1]

    def _locate(self, idx):
        di = bisect.bisect_right(self.cumulative_sizes, idx)
        si = idx if di == 0 else idx - self.cumulative_sizes[di - 1]
        return di, si

    def __getitem__(self, idx):
        di, si = self._locate(idx)
        return self.datasets[di][si]

    def get_gt_seg_map_by_idx(self, idx):
        di, si = self._locate(idx)
        return self.datasets[di].get_gt_seg_map_by_idx(si)

    def pre_eval(self, preds, indices):
        if not isinstance(indices, list):
            indices = [indices]
        if not isinstance(preds, list):
            preds = [preds]
        out = []
        for pred, idx in zip(preds, indices):
            di, si = self._locate(idx)
            out.extend(self.datasets[di].pre_eval(pred, si))
        return out

    def evaluate(self, results, **kwargs):
        if self.separate_eval:
            total, out = 0, {}
            for i, ds in enumerate(self.datasets):
                part = results[total:total + len(ds)]
                total += len(ds)
                res = ds.evaluate(part, **kwargs)
                out.update({f'{i}_{k}': v for k, v in res.items()})
            return out
        return self.datasets[0].evaluate(results, **kwargs)


@DATASETS.register_module()
class RepeatDataset:
    """(``dataset_wrappers.py:155``)."""

    def __init__(self, dataset, times):
        self.dataset = dataset
        self.times = times
        self.CLASSES = dataset.CLASSES
        self.PALETTE = getattr(dataset, 'PALETTE', None)
        self.ignore_index = getattr(dataset, 'ignore_index', 255)
        self._ori_len = len(dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % self._ori_len]

    def __len__(self):
        return self.times * self._ori_len


@DATASETS.register_module()
class MultiDomainDataset:
    """One sample per domain per item, keys prefixed ``dom{i+1}_``
    (``dataset_wrappers.py:262-287``): domain 1 indexed, the others
    drawn uniformly at random — the input of the DomainAdaptor/FMDA
    segmentor family."""

    def __init__(self, datasets, cfg=None):
        self.datasets = list(datasets)
        self.CLASSES = self.datasets[0].CLASSES
        self.PALETTE = getattr(self.datasets[0], 'PALETTE', None)
        self.ignore_index = getattr(self.datasets[0], 'ignore_index', 255)

    def __len__(self):
        return len(self.datasets[0])

    def __getitem__(self, idx):
        import numpy as np
        results = {}
        for i, ds in enumerate(self.datasets):
            cur = idx if i == 0 else int(np.random.randint(len(ds)))
            for key, value in ds[cur].items():
                results[f'dom{i + 1}_{key}'] = value
        return results


@DATASETS.register_module()
class MultiImageMixDataset:
    """(``dataset_wrappers.py:183``) pipeline-level mixing wrapper."""

    def __init__(self, dataset, pipeline, skip_type_keys=None):
        from .pipelines import Compose
        self.dataset = dataset
        self.pipeline = Compose(pipeline)
        self.CLASSES = dataset.CLASSES
        self.PALETTE = getattr(dataset, 'PALETTE', None)
        self.ignore_index = getattr(dataset, 'ignore_index', 255)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        results = dict(self.dataset[idx])
        results['mix_results'] = [
            self.dataset[int(np.random.randint(len(self.dataset)))]
        ]
        return self.pipeline(results)
