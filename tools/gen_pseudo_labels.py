#!/usr/bin/env python
"""Offline pseudo-label generation.

TPU-native re-design of the reference's ``PseudoLabelingHookV4``
(``rsiseg/core/hook/pseudo_labeling_hookv4.py:28-278``): the reference
abuses a training hook that sweeps the test loader, writes per-image h5
dumps and then *crashes training on purpose*; here the same two-phase
self-training workflow is a standalone tool:

  python tools/gen_pseudo_labels.py <config> <checkpoint> \
      --out-dir work_dirs/pseudo_labels/<name>

Per image it stores ``seg_logits`` (C,H,W float16) and optionally
feature maps; corpus-wide per-class entropy thresholds at the ratio
grid {0.01..0.5} (``pseudo_labeling_hookv4.py:172-205``) are stored per
image as ``thre@{ratio}``; per-level Gaussian sigmas matching a target
mean neighborhood similarity (``:236-278``) go to ``sigmas.json``.
The h5 files are consumed by ``LoadAnnotationsPseudoLabelsV2``.
"""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

import numpy as np

from pfst_tpu.utils import Config, DictAction

RATIOS = (0.01, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5)


def parse_args(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--out-dir', required=True)
    p.add_argument('--split', default='val',
                   choices=['train', 'val', 'test'])
    p.add_argument('--save-feats', action='store_true')
    p.add_argument('--feat-levels', type=int, nargs='+', default=[3])
    p.add_argument('--mean-sim', type=float, nargs='+', default=[0.6])
    p.add_argument('--kernel-size', type=int, default=3)
    p.add_argument('--dilation', type=int, default=2)
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    return p.parse_args(args)


def entropy_of(logits):
    e = logits - logits.max(0, keepdims=True)
    p = np.exp(e)
    p /= p.sum(0, keepdims=True)
    return -(p * np.log(p + 1e-12)).sum(0), p


def gaussian_sim_map(feat_hwc, kernel_size, dilation, sigma):
    """(h,w,C) feature map -> (h,w,k^2) gaussian neighborhood
    similarity (``pseudo_labeling_hookv4.py:210-234``)."""
    import jax.numpy as jnp

    from pfst_tpu.ops import unfold_neighbors
    x = jnp.asarray(feat_hwc, jnp.float32)[None]
    unf = unfold_neighbors(x, kernel_size, dilation)
    d2 = jnp.sum((unf - x[:, :, :, None, :])**2, axis=-1)
    return np.asarray(jnp.exp(-d2 / sigma**2))[0]


def solve_sigma(feats_list, kernel_size, dilation, target_mean_sim):
    """Binary-search sigma so mean gaussian neighborhood similarity hits
    the target (``pseudo_labeling_hookv4.py:236-278``)."""
    import jax.numpy as jnp
    from pfst_tpu.ops import unfold_neighbors
    d2s = []
    for f in feats_list:
        x = jnp.asarray(f)[None]  # (1,H,W,C)
        unf = unfold_neighbors(x, kernel_size, dilation)
        d2 = jnp.sum((unf - x[:, :, :, None, :])**2, axis=-1)
        d2s.append(np.asarray(d2).reshape(-1))
    d2 = np.concatenate(d2s)
    lo, hi = 1e-2, 1e4
    for _ in range(60):
        mid = (lo + hi) / 2
        mean_sim = float(np.mean(np.exp(-d2 / mid**2)))
        if mean_sim < target_mean_sim:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def main(args=None):
    args = parse_args(args)
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    import h5py
    import jax
    import jax.numpy as jnp
    from pfst_tpu.core.checkpoint import extract_student, load_checkpoint
    from pfst_tpu.datasets import build_dataset
    from pfst_tpu.models import build_segmentor

    os.makedirs(args.out_dir, exist_ok=True)
    dataset = build_dataset({**cfg.data[args.split], 'test_mode': True})
    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    variables = extract_student(load_checkpoint(args.checkpoint))

    @jax.jit
    def infer(variables, img):
        logits, states = model.apply(variables, img,
                                     method=model.encode_decode)
        return logits, states['feats'], states['decoded_features']

    # streaming per-class entropy histograms instead of holding every
    # pixel of the corpus in RAM (Cityscapes-scale splits would need
    # tens of GB); quantile resolution = log(C)/NBINS nats per bin
    num_classes = cfg.model['decode_head']['num_classes']
    NBINS = 8192
    ent_max = float(np.log(num_classes)) + 1e-6
    class_hist = np.zeros((num_classes, NBINS), np.int64)
    names = []
    sample_feats = []
    n = len(dataset)
    for idx in range(n):
        sample = dataset[idx]
        imgs = sample['img']
        metas = sample['img_metas']
        img = imgs[0] if isinstance(imgs, list) else imgs
        meta = metas[0] if isinstance(metas, list) else metas
        logits, feats, decoded = infer(variables, jnp.asarray(img)[None])
        logits_np = np.asarray(logits[0]).transpose(2, 0, 1)  # CHW
        ent, prob = entropy_of(logits_np.astype(np.float32))
        label = prob.argmax(0)
        bin_idx = np.minimum((ent / ent_max * NBINS).astype(np.int64),
                             NBINS - 1)
        class_hist += np.bincount(
            label.ravel() * NBINS + bin_idx.ravel(),
            minlength=num_classes * NBINS).reshape(num_classes, NBINS)
        name = osp.splitext(osp.basename(meta['filename']))[0]
        names.append(name)
        with h5py.File(osp.join(args.out_dir, f'{name}.h5'), 'w') as f:
            f.create_dataset('seg_logits',
                             data=logits_np.astype(np.float16))
            if args.save_feats:
                for lvl in args.feat_levels:
                    f.create_dataset(
                        f'feats_{lvl}',
                        data=np.asarray(feats[lvl][0]).astype(
                            np.float16))
        if idx < 8:
            sample_feats.append(np.asarray(decoded[0]))
        if (idx + 1) % 50 == 0:
            print(f'{idx + 1}/{n} images dumped')

    # corpus-wide per-class entropy thresholds per ratio, from the
    # streamed histograms (threshold = upper edge of the first bin
    # whose cumulative count reaches ratio * total)
    bin_edges = np.linspace(0.0, ent_max, NBINS + 1)
    cum = np.cumsum(class_hist, axis=1)
    totals = cum[:, -1]
    thresholds = {}
    for ratio in RATIOS:
        per_class = np.full((num_classes,), np.inf, np.float32)
        for c in range(num_classes):
            if totals[c] > 0:
                k = int(np.searchsorted(cum[c],
                                        ratio * totals[c], 'left'))
                per_class[c] = bin_edges[min(k + 1, NBINS)]
        thresholds[ratio] = per_class
    for name in names:
        with h5py.File(osp.join(args.out_dir, f'{name}.h5'), 'a') as f:
            for ratio, th in thresholds.items():
                f.create_dataset(f'thre@{ratio}', data=th)

    sigmas = {
        str(ms): solve_sigma(sample_feats, args.kernel_size,
                             args.dilation, ms)
        for ms in args.mean_sim
    }
    with open(osp.join(args.out_dir, 'sigmas.json'), 'w') as f:
        json.dump(sigmas, f, indent=2)

    # second pass (``pseudo_labeling_hookv4.py:154-163``): gaussian
    # neighborhood-similarity maps of the dumped features with the
    # solved sigma, consumed by FMDAAdaptor via
    # LoadAnnotationsPseudoLabelsV2(sim_feat_names=...)
    if args.save_feats:
        sigma0 = sigmas[str(args.mean_sim[0])]
        for name in names:
            with h5py.File(osp.join(args.out_dir, f'{name}.h5'),
                           'a') as f:
                for lvl in args.feat_levels:
                    key = f'feats_{lvl}'
                    if key not in f:
                        continue
                    feat = np.asarray(f[key], np.float32)  # (h,w,C)
                    sim = gaussian_sim_map(feat, args.kernel_size,
                                           args.dilation, sigma0)
                    f.create_dataset(f'gaussian_sim_feat_{lvl}',
                                     data=sim.astype(np.float16))
    print('thresholds + sigmas written to', args.out_dir)


if __name__ == '__main__':
    main()
