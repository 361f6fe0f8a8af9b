"""SeasonNet dataset (mirror of ``rsiseg/datasets/season_net.py:7``)."""
from .builder import DATASETS
from .eo_dataset import EODataset, SEASON_NET_CLASSES


@DATASETS.register_module()
class SeasonNetDataset(EODataset):
    CLASSES = SEASON_NET_CLASSES
