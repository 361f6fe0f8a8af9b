"""Offline pseudo-label generation hooks (mirror of
``rsiseg/core/hook/pseudo_labeling_hookv4.py:28-278``).

The reference hooks iterate the test loader at a configured iteration,
dump per-image ``seg_logits`` (+ selected feature levels) to h5 files,
compute corpus-wide per-class entropy thresholds at ratios
{0.01..0.5}, binary-search per-level gaussian sigmas reaching a target
mean similarity, then **halt training** by raising ValueError (the
generated corpus is the input of ``LoadAnnotationsPseudoLabelsV2``).

Here the same machinery lives in ``tools/gen_pseudo_labels.py`` (a
standalone CLI — the more natural TPU workflow since generation wants
its own jitted inference program); these hook wrappers schedule that
run from training configs for reference-config compatibility and halt
the loop the same way.
"""
from __future__ import annotations

import os.path as osp
from typing import Any, Dict

from .hook import HOOKS, Hook


class _StopTraining(ValueError):
    """Raised to halt the train loop after generation — mirrors the
    reference's deliberate ValueError (``pseudo_labeling_hookv4.py``,
    'stop training after generating pseudo labels')."""


@HOOKS.register_module()
class PseudoLabelingHookV4(Hook):
    """Generate the pseudo-label corpus at ``trigger_iter`` then halt.

    Args mirror the reference hook: ``out_dir`` (h5 dump target),
    ``split`` (data split to label), ``save_feats``/``feat_levels``,
    ``target_mean_sim`` for the sigma search, ``trigger_iter``
    (reference runs on its ``interval``; one-shot here).
    """

    def __init__(self, out_dir, split='test', save_feats=False,
                 feat_levels=(2, 3), target_mean_sim=0.6,
                 trigger_iter=0, **kwargs):
        self.out_dir = out_dir
        self.split = split
        self.save_feats = save_feats
        self.feat_levels = tuple(feat_levels)
        self.target_mean_sim = target_mean_sim
        self.trigger_iter = int(trigger_iter)

    def _generate(self, ctx: Dict[str, Any]):
        import sys
        sys.path.insert(0, osp.join(osp.dirname(__file__),
                                    '..', '..', '..', 'tools'))
        from gen_pseudo_labels import main as gen_main

        cfg = ctx['cfg']
        work_dir = ctx.get('work_dir') or '.'
        from ...utils.misc import find_latest_checkpoint
        ckpt = find_latest_checkpoint(osp.join(work_dir)) or \
            find_latest_checkpoint(osp.join(work_dir, 'ckpt'))
        if ckpt is None:
            raise _StopTraining(
                'PseudoLabelingHook: no checkpoint found to label from')
        argv = [cfg.filename, ckpt, '--out-dir', self.out_dir,
                '--split', self.split,
                '--mean-sim', str(self.target_mean_sim)]
        if self.save_feats:
            argv += ['--save-feats', '--feat-levels',
                     *map(str, self.feat_levels)]
        gen_main(argv)

    def after_train_iter(self, ctx, log_vars, vis_states=None):
        if int(ctx.get('iter', 0)) >= self.trigger_iter > 0:
            self._generate(ctx)
            raise _StopTraining(
                'pseudo labels generated; halting training '
                '(reference behavior: pseudo_labeling_hookv4.py)')

    def after_run(self, ctx):
        if self.trigger_iter <= 0:
            self._generate(ctx)


@HOOKS.register_module()
class PseudoLabelingHook(PseudoLabelingHookV4):
    """V1 (``pseudo_labeling_hook.py``) — same public workflow."""


@HOOKS.register_module()
class PseudoLabelingHookV2(PseudoLabelingHookV4):
    """V2 — same public workflow."""


@HOOKS.register_module()
class PseudoLabelingHookV3(PseudoLabelingHookV4):
    """V3 — same public workflow."""
