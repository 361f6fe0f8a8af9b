"""Preemption-safe training: a SIGUSR1/SIGTERM mid-run checkpoints at
the next iteration boundary and exits cleanly; auto_resume continues
from exactly that step (beyond the reference, which loses everything
since the last interval save)."""
import os
import signal

import numpy as np
import cv2
import pytest

# a real (tiny) train-loop drive — minutes; excluded from the fast path
pytestmark = pytest.mark.slow

from conftest import tiny_model_cfg
from pfst_tpu.core.hooks import HOOKS, Hook
from pfst_tpu.utils.config import Config
from pfst_tpu.utils.misc import find_latest_checkpoint


@HOOKS.register_module()
class _SendSigUsr1Hook(Hook):
    """Delivers SIGUSR1 to this process after a given iteration."""

    def __init__(self, at_iter=1):
        self.at_iter = at_iter

    def after_train_iter(self, ctx, log_vars, vis_states=None):
        if ctx['iter'] == self.at_iter:
            os.kill(os.getpid(), signal.SIGUSR1)


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('preempt_mini')
    rs = np.random.RandomState(0)
    os.makedirs(root / 'img_dir' / 'train')
    os.makedirs(root / 'ann_dir' / 'train')
    for i in range(16):
        img = rs.randint(0, 255, (40, 40, 3), np.uint8)
        ann = rs.randint(0, 7, (40, 40)).astype(np.uint8)
        cv2.imwrite(str(root / 'img_dir' / 'train' / f'x{i}.png'), img)
        cv2.imwrite(str(root / 'ann_dir' / 'train' / f'x{i}.png'), ann)
    return str(root)


def _cfg(data_root, max_iters, preempt_at=None):
    pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', reduce_zero_label=True),
        dict(type='Resize', img_scale=(40, 40),
             ratio_range=(0.8, 1.2)),
        dict(type='RandomCrop', crop_size=(32, 32),
             cat_max_ratio=0.75),
        dict(type='Normalize', mean=[123.675, 116.28, 103.53],
             std=[58.395, 57.12, 57.375], to_rgb=True),
        dict(type='Pad', size=(32, 32), pad_val=0, seg_pad_val=255),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_semantic_seg'])]
    cfg = dict(
        model=tiny_model_cfg(),
        data=dict(samples_per_gpu=1, workers_per_gpu=1,
                  train=dict(type='ISPRSDataset', data_root=data_root,
                             img_dir='img_dir/train',
                             ann_dir='ann_dir/train',
                             gt_seg_map_loader_cfg=dict(
                                 reduce_zero_label=True),
                             pipeline=pipeline)),
        optimizer=dict(type='SGD', lr=1e-3, momentum=0.9,
                       weight_decay=0.0),
        optimizer_config=None,
        lr_config=None,
        runner=dict(type='IterBasedRunner', max_iters=max_iters),
        checkpoint_config=dict(interval=100),
        log_config=dict(interval=1))
    if preempt_at is not None:
        cfg['custom_hooks'] = [
            dict(type='_SendSigUsr1Hook', at_iter=preempt_at)]
    return Config(cfg)


def test_preempt_checkpoints_and_resumes(data_root, tmp_path):
    from pfst_tpu.apis import train_segmentor
    wd = str(tmp_path / 'wd')
    state = train_segmentor(_cfg(data_root, 6, preempt_at=2), seed=0,
                            work_dir=wd, validate=False)
    assert int(state.step) == 2  # stopped at the signal boundary
    latest = find_latest_checkpoint(wd)
    assert latest and latest.endswith('/2'), latest
    # SIGUSR1 handler was restored after the loop
    assert signal.getsignal(signal.SIGUSR1) in (
        signal.SIG_DFL, signal.Handlers.SIG_DFL)

    # resume runs to completion (no preempt hook this time)
    state = train_segmentor(_cfg(data_root, 6), seed=0, work_dir=wd,
                            validate=False, auto_resume=True)
    assert int(state.step) == 6
    assert find_latest_checkpoint(wd).endswith('/6')
