#!/usr/bin/env python
"""Bisect the long-run ``data:`` creep (VERDICT r4 'what's weak' #2).

``artifacts/convergence_r4/train.log`` shows per-iter ``data:`` time
creeping 0.25-0.4 s -> 1.0-2.1 s as the run ages, RESETTING to ~0.3 s
right after each eval+checkpoint cycle (iters 500/1000), then creeping
back over ~100-150 iters.  Two candidate culprits, cleanly separable:

  * host side — dataset pipeline / collate / prefetch thread / GC /
    malloc state degrading with process age;
  * device side — ``data:`` also contains the main-thread
    ``jax.device_put`` through the TPU tunnel (serial-put policy), and
    the tunnel link is known to swing 36-78 MB/s; at b2 512^2 bf16 a
    batch is ~21 MB, so 0.25 s->2.1 s is exactly 84->10 MB/s.

This probe reruns the REAL loader stack (shipped UDA config, same
DataLoader + BatchPrefetcher as ``apis/train.py``) with the DEVICE
STUBBED OUT: the step is a sleep, the put is a host-side copy.  If the
creep reproduces here it is host-side; if the series stays flat, the
creep lives in the device_put/tunnel path (probe that on-chip with
tools/probe_transfer.py run from an AGED process).

Usage: python tools/probe_loader_creep.py --iters 600 --eval-every 150
Writes a per-iter series + segment summary to stdout (tee into
artifacts/).
"""
import argparse
import gc
import os
import os.path as osp
import resource
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')  # host-only by design

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default=osp.join(
        REPO, 'configs/pfst/'
        'pfst_pots_irrg2vaih_irrg_deeplabv3plus_r50-d8.py'))
    ap.add_argument('--iters', type=int, default=600)
    ap.add_argument('--step-s', type=float, default=0.24,
                    help='stubbed device-step wall time')
    ap.add_argument('--eval-every', type=int, default=150,
                    help='simulate an eval+ckpt pause every N iters '
                         '(0 = never)')
    ap.add_argument('--batch', type=int, default=2)
    ap.add_argument('--workers', type=int, default=2)
    ap.add_argument('--log-every', type=int, default=25)
    args = ap.parse_args()

    from pfst_tpu.apis.train import BatchPrefetcher
    from pfst_tpu.datasets import build_dataloader, build_dataset
    from pfst_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    ds = build_dataset(cfg.data['train'])
    loader = build_dataloader(ds, args.batch, args.workers,
                              shuffle=True, seed=0, drop_last=True,
                              infinite=True)
    val_ds = build_dataset({**cfg.data['val'], 'test_mode': True}) \
        if args.eval_every else None
    val_loader = build_dataloader(val_ds, 1, 1, shuffle=False) \
        if args.eval_every else None

    def put(b):
        # stand-in for jax.device_put's host-side cost WITHOUT the
        # tunnel: one contiguous copy of each array
        return {k: (np.ascontiguousarray(v)
                    if isinstance(v, np.ndarray) else v)
                for k, v in b.items()}

    pf = BatchPrefetcher(iter(loader), loader, put, depth=2)
    _ = pf.next()  # warm

    data_t = []
    t_wall0 = time.time()
    for it in range(args.iters):
        time.sleep(args.step_s)          # stubbed device step
        t0 = time.time()
        batch = pf.next()
        data_t.append(time.time() - t0)
        assert batch['img'].shape[0] == args.batch

        if args.log_every and (it + 1) % args.log_every == 0:
            seg = data_t[-args.log_every:]
            rss = resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 1e6
            gc0, gc1, gc2 = gc.get_count()
            print(f'iter {it + 1:5d} data mean '
                  f'{np.mean(seg):.3f}s p90 '
                  f'{np.percentile(seg, 90):.3f}s max {max(seg):.3f}s '
                  f'rss {rss:.2f}GB gc {gc0}/{gc1}/{gc2} '
                  f'threads {len(sys._current_frames())}',
                  flush=True)

        if args.eval_every and (it + 1) % args.eval_every == 0:
            # simulate the eval sweep's host side: decode the val set,
            # hold a big result list, then free it (+ a ckpt-sized
            # write burst)
            t0 = time.time()
            results = [s for s in val_loader]
            blob = np.zeros((64, 1 << 20), np.uint8)  # 64 MB
            path = osp.join('/tmp', 'probe_ckpt.bin')
            blob.tofile(path)
            os.remove(path)
            del results, blob
            print(f'iter {it + 1:5d} simulated eval+ckpt pause '
                  f'({time.time() - t0:.1f}s)', flush=True)

    pf.close()
    # segment summary: creep visible as a rising mean
    n = len(data_t)
    print('\nsegment means (of %d iters, step stub %.2fs):'
          % (n, args.step_s))
    for s in range(0, n, 100):
        seg = data_t[s:s + 100]
        print(f'  iters {s + 1:4d}-{s + len(seg):4d}: mean '
              f'{np.mean(seg):.3f}s p90 '
              f'{np.percentile(seg, 90):.3f}s max {max(seg):.3f}s')
    first = np.mean(data_t[:100])
    last = np.mean(data_t[-100:])
    print(f'creep ratio last100/first100: {last / max(first, 1e-9):.2f}'
          f' (host-side creep if >> 1; flat -> suspect the tunnel put)')
    print(f'total wall {time.time() - t_wall0:.0f}s')


if __name__ == '__main__':
    main()
