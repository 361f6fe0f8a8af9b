#!/usr/bin/env python
"""Data-loader headroom benchmark (host-side only, no accelerator).

Measures sustained batches/sec of the UDA train loader — the full
per-sample pipeline (load, resize-jitter, crop, rot90, flips,
photometric distortion, normalize, pad, strong aug) over the 1024²
synthetic corpus — for thread vs process workers at several batch
sizes, and reports the data-time : step-time ratio against a given
device step time (default: the measured 512² UDA step, bench_train).

Usage:  python tools/bench_loader.py [--batches 30] [--step-s 0.45]
Needs data/Potsdam_IRRG_1024 + data/Vaihingen_IRRG_1024 (synthetic ok:
tools/make_synthetic_data.py).
"""
import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


def bench(batch, workers, use_processes, n_batches):
    from pfst_tpu.datasets import build_dataloader, build_dataset
    from pfst_tpu.utils import Config

    cfg = Config.fromfile(osp.join(
        osp.dirname(__file__), '..', 'configs', 'pfst',
        'pfst_pots_irrg2vaih_irrg_deeplabv3plus_r50-d8.py'))
    ds = build_dataset(cfg.data['train'])
    loader = build_dataloader(ds, batch, workers, shuffle=True,
                              use_processes=use_processes, seed=0)
    it = iter(loader)
    next(it)  # warm the pool + prefetch
    t0 = time.perf_counter()
    n = 0
    while n < n_batches:
        try:
            next(it)
        except StopIteration:
            it = iter(loader)
            continue
        n += 1
    dt = time.perf_counter() - t0
    # quiesce before the next config: close the iterator (stops the
    # producer via its finally) and give worker threads time to park —
    # forking the NEXT config's process pool while this config's
    # threads are mid-allocation can deadlock the forked child
    # (fork+threads hazard; the training CLI never mixes modes in one
    # process, only this benchmark does)
    it.close()
    time.sleep(1.5)
    return dt / n_batches


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('--batches', type=int, default=30)
    p.add_argument('--batch-sizes', type=int, nargs='*',
                   default=[2, 8, 16])
    p.add_argument('--workers', type=int, default=4)
    p.add_argument('--step-s', type=float, default=0.45,
                   help='measured device s/iter to ratio against '
                        '(bench_train.py batch-2 full UDA step)')
    a = p.parse_args(args)

    import os
    print(f'# host cpu count: {os.cpu_count()}')
    for batch in a.batch_sizes:
        for procs in (False, True):
            s = bench(batch, a.workers, procs, a.batches)
            rec = {
                'metric': 'uda loader batches/sec',
                'batch': batch,
                'workers': a.workers,
                'mode': 'process' if procs else 'thread',
                's_per_batch': round(s, 4),
                'samples_per_sec': round(batch / s, 2),
                'data_over_step_ratio': round(s / a.step_s, 2),
            }
            print(json.dumps(rec))
    return 0


if __name__ == '__main__':
    sys.exit(main())
