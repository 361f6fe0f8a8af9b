"""Logger hooks (mirror of the reference's log_config hooks).

``TextLoggerHook`` is a no-op here (text logging is inline in the train
loop); ``TensorboardLoggerHook`` writes scalars via tf.summary;
``WandbHookSeg`` (``rsiseg/core/hook/wandblogger_hook_seg.py:27``) logs
scalars plus the ``vis|``-prefixed visualisation states (seg-mask
triplets, similarity density maps) produced by the fused train step.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ...utils.logger import get_root_logger
from .hook import HOOKS, Hook


@HOOKS.register_module()
class TextLoggerHook(Hook):

    def __init__(self, by_epoch=False, interval=50, **kwargs):
        self.interval = interval


@HOOKS.register_module()
class TensorboardLoggerHook(Hook):

    def __init__(self, log_dir=None, interval=50, **kwargs):
        self.log_dir = log_dir
        self.interval = interval
        self._writer = None

    def before_run(self, ctx):
        try:
            import tensorflow as tf
            self._writer = tf.summary.create_file_writer(
                self.log_dir or ctx.get('work_dir', '.') + '/tb')
        except Exception as e:
            get_root_logger().warning(f'tensorboard unavailable: {e}')

    def after_train_iter(self, ctx, log_vars, vis_states=None):
        if self._writer is None:
            return
        step = ctx['iter']
        if step % self.interval:
            return
        import tensorflow as tf
        with self._writer.as_default():
            for k, v in log_vars.items():
                tf.summary.scalar(k, float(v), step=step)

    def after_run(self, ctx):
        if self._writer is not None:
            self._writer.flush()


def _colorize(label, palette):
    label = np.asarray(label).astype(np.int64)
    pal = np.asarray(palette, np.uint8)
    out = np.zeros(label.shape + (3,), np.uint8)
    valid = (label >= 0) & (label < len(pal))
    out[valid] = pal[label[valid]]
    return out


@HOOKS.register_module()
class WandbHookSeg(Hook):
    """W&B logging of scalars + ``vis|`` visualisation states
    (``wandblogger_hook_seg.py:134-287``)."""

    def __init__(self, init_kwargs=None, interval=200, num_vis=2,
                 **kwargs):
        self.init_kwargs = init_kwargs or {}
        self.interval = interval
        self.num_vis = num_vis
        self._wandb = None

    def before_run(self, ctx):
        try:
            import wandb
            self._wandb = wandb
            wandb.init(**self.init_kwargs)
        except Exception as e:
            get_root_logger().warning(f'wandb unavailable: {e}')

    def after_train_iter(self, ctx, log_vars, vis_states=None):
        if self._wandb is None or ctx['iter'] % self.interval:
            return
        payload = {k: float(v) for k, v in log_vars.items()}
        palette = ctx.get('palette')
        for name, value in (vis_states or {}).items():
            kind = name.split('|')[1] if '|' in name else name
            try:
                if kind.startswith('seg_mask') and palette is not None:
                    img, gt, pred = [np.asarray(v) for v in value]
                    for i in range(min(self.num_vis, img.shape[0])):
                        trip = np.concatenate([
                            _norm_img(img[i]),
                            _colorize(np.squeeze(gt[i]), palette),
                            _colorize(np.squeeze(pred[i]), palette)
                        ], axis=1)
                        payload[f'{name}/{i}'] = self._wandb.Image(trip)
                elif kind.startswith('density'):
                    img, density = [np.asarray(v) for v in value[:2]]
                    for i in range(min(self.num_vis, img.shape[0])):
                        payload[f'{name}/{i}'] = self._wandb.Image(
                            np.squeeze(density[i]))
                elif kind.startswith('hist'):
                    names, values = value
                    for nm, vals in zip(names, values):
                        payload[f'{name}/{nm}'] = \
                            self._wandb.Histogram(np.asarray(vals))
            except Exception:
                continue
        self._wandb.log(payload, step=ctx['iter'])

    def after_run(self, ctx):
        if self._wandb is not None:
            self._wandb.finish()


@HOOKS.register_module()
class MMSegWandbHook(WandbHookSeg):
    """scalar-only W&B hook (``wandblogger_hook.py``)."""

    def after_train_iter(self, ctx, log_vars, vis_states=None):
        super().after_train_iter(ctx, log_vars, None)


@HOOKS.register_module()
class WandbHookStatistics(WandbHookSeg):
    """statistics variant kept for config compatibility."""


def _norm_img(img):
    img = np.asarray(img, np.float32)
    lo, hi = img.min(), img.max()
    return ((img - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)


@HOOKS.register_module()
class ProfilerHook(Hook):
    """Capture a JAX device profile for a window of train iterations.

    The reference has no profiler (SURVEY §5: mmcv IterTimerHook only);
    on TPU a proper trace is the tool that matters.  Writes a
    Perfetto/XProf trace to ``{work_dir}/{out_dir}`` covering steps
    [start_iter, start_iter + num_steps).

    Usage::

        custom_hooks = [dict(type='ProfilerHook', start_iter=10,
                             num_steps=5)]
    """

    def __init__(self, start_iter=10, num_steps=5, out_dir='profile',
                 **kwargs):
        self.start_iter = int(start_iter)
        self.num_steps = int(num_steps)
        self.out_dir = out_dir
        self._active = False

    def after_train_iter(self, ctx, log_vars, vis_states=None):
        import os.path as osp

        import jax
        it = int(ctx.get('iter', 0))
        if not self._active and it == self.start_iter:
            path = osp.join(ctx.get('work_dir') or '.', self.out_dir)
            jax.profiler.start_trace(path)
            self._active = True
            get_root_logger().info(f'profiler trace started -> {path}')
        elif self._active and it >= self.start_iter + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            get_root_logger().info('profiler trace stopped')

    def after_run(self, ctx):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
