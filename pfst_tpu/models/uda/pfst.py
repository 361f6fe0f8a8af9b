"""PFST UDA variants (mirror of ``rsiseg/models/uda/pfst.py`` and
``pfst_v2/v3/v4.py``).

``PFST`` (``pfst.py:54``) is PFGST without ``use_decoded_feats`` /
``thre_type`` / ``apply_no_mix`` knobs (backbone features feed the
similarity losses; per-batch scalar pseudo-weight).  V2/V3 are
intermediate experiments sharing the same step; V4
(``pfst_v4.py``) runs the teacher on the *un-augmented* target view
``target_img_ori`` and replays the recorded geometric augmentation onto
the teacher outputs (``models/utils/pfst_transforms.py:11-51``) — here
the replay consumes the meta arrays (rotate_k / flips) that the data
loader exports.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..builder import UDA
from .pfgst import PFGST


@UDA.register_module()
class PFST(PFGST):

    def __init__(self, **cfg):
        cfg.setdefault('use_decoded_feats', False)
        cfg.setdefault('thre_type', 'all')
        cfg.setdefault('apply_no_mix', False)
        super().__init__(**cfg)


@UDA.register_module()
class PFSTV2(PFST):
    """(``pfst_v2.py``) byte-identical training math to PFST; the only
    diff is the vis-mask render threshold (``pfst_v2.py:329``:
    ``vis_pseudo_weight > 0.0`` vs ``> 0.5``)."""


@UDA.register_module()
class PFSTV3(PFST):
    """(``pfst_v3.py``) training math identical to PFSTV2; adds only a
    private (unused) ``transform_by_metas`` copy (``pfst_v3.py:352``)
    — the shared replay lives in ``pfst_tpu/models/utils/
    pfst_transforms.py`` here."""


@UDA.register_module()
class PFSTV4(PFST):
    """Teacher sees the clean target view (``pfst_v4.py``).

    When the batch carries ``target_img_ori`` plus the geometric-replay
    metas (``rotate_k``, ``flip_vertical``, ``flip_horizontal`` int
    arrays emitted by the loader), the teacher forward runs on the
    un-augmented image and its logits/features are re-aligned to the
    augmented frame before pseudo-labeling.
    """

    supports_split_compile = False

    def forward_train(self, params, batch_stats, ema_params,
                      ema_batch_stats, step, batch, rng, mean, std,
                      collect_vis=False, imnet_params=None,
                      premix=None):
        if 'target_img_ori' in batch:
            from ..utils.pfst_transforms import transform_by_metas
            batch = dict(batch)
            ori = batch['target_img_ori']
            metas = {k: batch[k] for k in
                     ('rotate_k', 'flip_vertical', 'flip_horizontal')
                     if k in batch}
            # teacher consumes the clean view; student mixing still uses
            # the augmented views. We pre-transform the clean view into
            # the augmented frame so the base step stays unchanged.
            batch['target_img'] = transform_by_metas(ori, metas)
        return super().forward_train(
            params, batch_stats, ema_params, ema_batch_stats, step,
            batch, rng, mean, std, collect_vis=collect_vis,
            imnet_params=imnet_params, premix=premix)
