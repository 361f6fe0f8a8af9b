"""UDADatasetV2 (mirror of ``rsiseg/datasets/uda_dataset_v2.py``).

Length equals the *source* length; the target sample is drawn uniformly
at random per item (``uda_dataset_v2.py:120-140``).  Used by the
SeasonNet spring->fall config.
"""
from __future__ import annotations

import numpy as np

from .builder import DATASETS
from .uda_dataset import UDADataset


@DATASETS.register_module()
class UDADatasetV2(UDADataset):

    def __getitem__(self, idx):
        if self.rcs_enabled:
            return self.get_rare_class_sample()
        s1 = self.source[idx]
        i2 = int(np.random.randint(len(self.target)))
        s2 = self.target[i2]
        return self._merge(s1, s2)

    def __len__(self):
        return len(self.source)
