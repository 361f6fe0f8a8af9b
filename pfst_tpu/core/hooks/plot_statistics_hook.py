"""Local-similarity statistics plots.

Mirror of ``rsiseg/core/hook/plot_statistics_hook.py:29-``: samples
batches, computes gaussian/cosine neighborhood similarity histograms of
the model's features at configurable levels, and writes density plots
to ``log_dir``.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Optional

import numpy as np

from ...utils.logger import get_root_logger
from .hook import HOOKS, Hook


def similarity_histogram(feats_nhwc, kernel_size=3, dilation=2,
                         sigma=None, num_bins=100):
    """(values, bin_edges) of neighborhood similarities for one map."""
    import jax.numpy as jnp
    from ...ops import unfold_neighbors
    x = jnp.asarray(feats_nhwc)
    unf = unfold_neighbors(x, kernel_size, dilation)
    center = x[:, :, :, None, :]
    if sigma is not None:
        d2 = jnp.sum((unf - center)**2, axis=-1)
        sim = jnp.exp(-d2 / sigma**2)
    else:
        num = jnp.sum(unf * center, axis=-1)
        na = jnp.sqrt(jnp.sum(unf**2, axis=-1))
        nb = jnp.sqrt(jnp.sum(center**2, axis=-1))
        sim = num / jnp.maximum(na * nb, 1e-8)
    vals = np.asarray(sim).reshape(-1)
    hist, edges = np.histogram(vals, bins=num_bins, range=(-1.0, 1.0))
    return hist, edges


@HOOKS.register_module()
class PlotStatisticsHook(Hook):

    def __init__(self, log_dir, sim_feat_cfg=None, data_cfg=None,
                 interval=1, num_batches=4, **kwargs):
        self.log_dir = log_dir
        self.sim_feat_cfg = sim_feat_cfg or {}
        self.interval = interval
        self.num_batches = num_batches

    def after_eval(self, ctx, metrics):
        algo = ctx.get('algo')
        state = ctx.get('state')
        loader = ctx.get('val_loader')
        if algo is None or state is None or loader is None:
            return
        import jax.numpy as jnp
        os.makedirs(self.log_dir, exist_ok=True)
        model = algo.get_model()
        variables = algo.student_variables(state)
        hists = []
        for bi, batch in enumerate(loader):
            if bi >= self.num_batches:
                break
            img = batch['img']
            if isinstance(img, list):
                img = img[0]
            _, states = model.apply(variables, jnp.asarray(img),
                                    method=model.encode_decode)
            feats = states['decoded_features']
            hist, edges = similarity_histogram(
                feats,
                kernel_size=self.sim_feat_cfg.get('kernel_size', 3),
                dilation=self.sim_feat_cfg.get('dilation', 2),
                sigma=self.sim_feat_cfg.get('sigma'))
            hists.append(hist)
        if not hists:
            return
        total = np.sum(hists, axis=0)
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots()
            ax.bar(edges[:-1], total, width=np.diff(edges))
            ax.set_xlabel('neighborhood similarity')
            step = ctx.get('iter', 0)
            fig.savefig(osp.join(self.log_dir, f'sim_hist_{step}.png'))
            plt.close(fig)
        except Exception as e:
            get_root_logger().warning(f'plot skipped: {e}')


@HOOKS.register_module()
class PlotMultiClassStatisticsHook(PlotStatisticsHook):
    """per-class variant (``plot_statistics_hook.py``, multi-class)."""
