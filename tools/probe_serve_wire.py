#!/usr/bin/env python
"""A/B the serving request path: host-normalized f32 wire vs
``--device-normalize`` uint8 wire (PERF.md round 5).

Measured on the tunneled v5e chip, 1024^2 uint8 requests, flagship
DeepLabV3+ R50 config (``artifacts/serve_wire_ab_r5.log``):
f32 wire median 0.520 s/request vs uint8 wire 0.222 s/request —
2.3x end-to-end request latency (12.6 MB -> 3.1 MB per request
through the link; the forward itself is ~0.2 s).

Usage: python tools/probe_serve_wire.py [config]
"""
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, 'tools'))

import numpy as np


def main():
    import serve
    from pfst_tpu.utils.config import Config

    cfg_path = sys.argv[1] if len(sys.argv) > 1 else osp.join(
        REPO, 'configs/pfst/'
        'pfst_pots_irrg2vaih_irrg_deeplabv3plus_r50-d8.py')
    img = np.random.RandomState(0).randint(
        0, 255, (1024, 1024, 3)).astype(np.uint8)

    for label, kw in (
            ('host-normalized f32 wire', {}),
            ('device-normalize uint8 wire',
             dict(device_normalize='uint8'))):
        pred = serve.Predictor(Config.fromfile(cfg_path), **kw)
        ts = []
        for i in range(8):
            img[0, 0, 0] = i  # vary content (elision guard)
            t0 = time.perf_counter()
            pred.predict(img)
            ts.append(time.perf_counter() - t0)
        print(f'{label}: first(compile) {ts[0]:.2f}s, median-of-rest '
              f'{np.median(ts[1:]):.3f}s, all '
              f'{["%.2f" % t for t in ts]}', flush=True)


if __name__ == '__main__':
    main()
