"""Dataset/pipeline registries, dataset builder and data loader.

Mirrors ``rsiseg/datasets/builder.py``: ``build_dataset`` special-cases
the UDA pairing datasets and wrappers; ``build_dataloader`` replaces
torchdata ``DataLoader2`` + ``DistributedSampler`` with a
thread-pool-prefetched, epoch-shuffled, per-host-sharded iterator that
yields fixed-shape numpy batches ready for ``jax.device_put``.
"""
from __future__ import annotations

import copy
import itertools
import math
import os
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from ..utils.registry import Registry

# set immediately before a fork-context worker pool is created; the
# forked children inherit it so only indices/results cross the pipe
# fork-inherited registry: one slot per DataLoader, keyed by a unique
# loader id. A single module-global dataset slot would be clobbered
# when a second process-backed loader (e.g. the eval loader) builds
# its pool — and since ProcessPoolExecutor forks workers lazily on
# submit, an earlier loader's late-forked workers would then inherit
# the wrong dataset.
_WORKER_DATASETS: dict = {}
_LOADER_IDS = itertools.count()


def _worker_getitem(loader_id, i):
    return _WORKER_DATASETS[loader_id][i]

DATASETS = Registry('datasets')
PIPELINES = Registry('pipelines')


def _concat(datasets, separate_eval=True):
    from .dataset_wrappers import ConcatDataset
    return ConcatDataset(datasets, separate_eval)


def build_dataset(cfg, default_args=None):
    """Build a dataset (handles UDA pairing + wrappers like
    ``datasets/builder.py:70-98``)."""
    from .dataset_wrappers import (ConcatDataset, MultiDomainDataset,
                                   RepeatDataset)
    from .uda_dataset import UDADataset
    from .uda_dataset_v2 import UDADatasetV2
    if isinstance(cfg, (list, tuple)):
        return _concat([build_dataset(c, default_args) for c in cfg])
    cfg = copy.deepcopy(dict(cfg))
    dtype = cfg.get('type')
    if dtype == 'UDADataset':
        return UDADataset(
            source=build_dataset(cfg['source'], default_args),
            target=build_dataset(cfg['target'], default_args),
            cfg=cfg)
    if dtype == 'UDADatasetV2':
        return UDADatasetV2(
            source=build_dataset(cfg['source'], default_args),
            target=build_dataset(cfg['target'], default_args),
            cfg=cfg)
    if dtype == 'MultiDomainDataset':
        datasets = [build_dataset(c, default_args)
                    for c in cfg['datasets']]
        return MultiDomainDataset(datasets, cfg)
    if dtype == 'RepeatDataset':
        return RepeatDataset(
            build_dataset(cfg['dataset'], default_args), cfg['times'])
    if dtype == 'ConcatDataset':
        return _concat([build_dataset(c, default_args)
                        for c in cfg['datasets']],
                       cfg.get('separate_eval', True))
    if isinstance(cfg.get('img_dir'), (list, tuple)) or \
            isinstance(cfg.get('split'), (list, tuple)):
        return _concat(_split_multi_image_dir(cfg, default_args))
    if default_args:
        for k, v in default_args.items():
            cfg.setdefault(k, v)
    return DATASETS.build(cfg)


def _split_multi_image_dir(cfg, default_args):
    """Expand list-valued img_dir/ann_dir/split into one dataset each."""
    datasets = []
    img_dirs = cfg['img_dir'] if isinstance(cfg['img_dir'], (list, tuple)) \
        else [cfg['img_dir']]
    ann_dirs = cfg.get('ann_dir')
    ann_dirs = ann_dirs if isinstance(ann_dirs, (list, tuple)) \
        else [ann_dirs] * len(img_dirs)
    splits = cfg.get('split')
    splits = splits if isinstance(splits, (list, tuple)) \
        else [splits] * len(img_dirs)
    for img_dir, ann_dir, split in zip(img_dirs, ann_dirs, splits):
        c = copy.deepcopy(cfg)
        c['img_dir'], c['ann_dir'], c['split'] = img_dir, ann_dir, split
        datasets.append(build_dataset(c, default_args))
    return datasets


class DataLoader:
    """Shuffled, sharded, prefetched batch iterator.

    Per-host sharding mirrors ``DistributedSampler``: rank r of world w
    takes indices ``r::w`` of the (seeded) permutation; epochs reshuffle
    with seed+epoch like the reference's cross-rank-synced sampler
    (``samplers/distributed_sampler.py:12-69``).
    """

    def __init__(self,
                 dataset,
                 samples_per_gpu: int = 2,
                 workers_per_gpu: int = 2,
                 num_gpus: int = 1,
                 shuffle: bool = True,
                 seed: int = 0,
                 drop_last: Optional[bool] = None,
                 rank: int = 0,
                 world_size: int = 1,
                 infinite: bool = False,
                 use_processes: Optional[bool] = None,
                 pin_memory: bool = False):
        self.dataset = dataset
        self.batch_size = samples_per_gpu * num_gpus
        self.num_workers = max(1, workers_per_gpu * num_gpus)
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.infinite = infinite
        self.drop_last = shuffle if drop_last is None else drop_last
        self.epoch = 0
        if use_processes is None:
            use_processes = os.environ.get(
                'PFST_DATA_PROCESSES', '') not in ('', '0', 'false')
        self.use_processes = use_processes
        self._pool = None
        self._skip_batches = 0
        # buffer-churn guard for the big sample/batch arrays (see
        # utils/set_env.py:tune_malloc — idempotent, env-gated)
        from ..utils.set_env import tune_malloc
        tune_malloc()

    def __len__(self):
        n = len(self.dataset) // self.world_size
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            g = np.random.RandomState(self.seed + epoch)
            idx = g.permutation(n)
        else:
            idx = np.arange(n)
        return idx[self.rank::self.world_size]

    def batches_per_epoch(self) -> int:
        n = len(self._epoch_indices(0))
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def set_position(self, batch_idx: int) -> None:
        """Fast-forward the seeded stream so the next batch yielded is
        global batch ``batch_idx`` (counted from iteration 0):
        deterministic data resume after a checkpoint restore.  The
        reference replays each epoch from its start on resume (mmcv
        IterLoader keeps no intra-epoch cursor); here the epoch
        permutations are pure functions of ``seed + epoch``, so the
        skip costs nothing — no samples are produced and discarded."""
        if batch_idx < 0:
            raise ValueError(f'negative batch_idx {batch_idx}')
        bpe = max(self.batches_per_epoch(), 1)
        self.epoch = batch_idx // bpe
        self._skip_batches = batch_idx % bpe

    def _get_pool(self):
        """Lazily created worker pool, persistent across epochs.

        Default: a thread pool (IO + cv2 release the GIL, so
        per-sample pipeline work overlaps across workers AND with the
        device step).  With ``use_processes`` (cfg
        ``data.use_processes`` or env ``PFST_DATA_PROCESSES=1``):
        forked worker PROCESSES, for python-heavy pipelines where the
        GIL becomes the bottleneck (the reference's multiprocess
        torch DataLoader role).  Decide from the train log's ``data:``
        seconds — see PERF.md."""
        if self._pool is None:
            if self.use_processes:
                import multiprocessing as mp
                from concurrent.futures import ProcessPoolExecutor
                from functools import partial
                # fork inherits the dataset via the module registry:
                # only integer indices and samples cross the pipe
                loader_id = next(_LOADER_IDS)
                _WORKER_DATASETS[loader_id] = self.dataset
                self._pool = ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=mp.get_context('fork'))
                self._map_fn = partial(_worker_getitem, loader_id)
            else:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(self.num_workers)
                self._map_fn = self.dataset.__getitem__
        return self._pool

    def _iter_epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices(epoch)
        nb = len(indices) // self.batch_size if self.drop_last else \
            math.ceil(len(indices) / self.batch_size)
        first_batch = self._skip_batches  # set_position within-epoch
        self._skip_batches = 0
        q: 'queue.Queue' = queue.Queue(maxsize=max(2, self.num_workers))
        stop = threading.Event()
        pool = self._get_pool()

        def put_or_stop(item) -> bool:
            """Bounded-queue put that aborts when the consumer left —
            a plain ``q.put`` would block forever on an abandoned
            iterator (e.g. a hook breaking out after N batches),
            leaking the producer thread and its queued batches."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for bi in range(first_batch, nb):
                    if stop.is_set():
                        return
                    sel = indices[bi * self.batch_size:(bi + 1) *
                                  self.batch_size]
                    samples = list(
                        pool.map(self._map_fn,
                                 [int(i) for i in sel]))
                    if not put_or_stop(('batch', collate(samples))):
                        return
            except BaseException as e:  # surface, never swallow
                put_or_stop(('error', e))
                return
            put_or_stop(('done', None))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                kind, item = q.get()
                if kind == 'error':
                    # re-raise the pipeline failure in the consumer:
                    # silently truncating the epoch would hang the
                    # infinite train loader with no diagnostic
                    raise item
                if kind == 'done':
                    break
                yield item
        finally:
            stop.set()

    def __iter__(self):
        if len(self) == 0:
            # drop_last with a per-rank shard smaller than the global
            # batch would otherwise spin forever in infinite mode
            raise ValueError(
                f'DataLoader yields 0 batches: dataset of '
                f'{len(self.dataset)} split over world_size='
                f'{self.world_size} gives '
                f'{len(self._epoch_indices(0))} samples/rank for '
                f'batch_size={self.batch_size} (drop_last='
                f'{self.drop_last})')
        if self.infinite:
            epoch = self.epoch
            while True:
                yield from self._iter_epoch(epoch)
                epoch += 1
        else:
            yield from self._iter_epoch(self.epoch)
            self.epoch += 1


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack same-shaped arrays; keep metas as lists."""
    batch: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        else:
            batch[key] = vals
    return batch


def build_dataloader(dataset,
                     samples_per_gpu,
                     workers_per_gpu,
                     num_gpus=1,
                     dist=False,
                     shuffle=True,
                     seed=None,
                     drop_last=False,
                     pin_memory=True,
                     persistent_workers=False,
                     rank=0,
                     world_size=1,
                     infinite=False,
                     use_processes=None,
                     **kwargs):
    """Public builder (signature mirrors ``datasets/builder.py:100``)."""
    return DataLoader(
        dataset,
        samples_per_gpu=samples_per_gpu,
        workers_per_gpu=workers_per_gpu,
        num_gpus=1,
        shuffle=shuffle,
        seed=seed or 0,
        drop_last=drop_last or shuffle,
        rank=rank,
        world_size=world_size,
        infinite=infinite,
        use_processes=use_processes)
