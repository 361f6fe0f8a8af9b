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
    un-augmented image and the recorded augmentation is replayed onto
    the teacher's *outputs* — the logits (scale 1) and the
    ``feat_level`` feature map (at its stride) — exactly the
    reference's output-side replay (``pfst_v4.py:250-258``).  Replay
    on the teacher *input* is NOT equivalent: CNNs are not
    rot90/flip-equivariant, and the whole point of V4 is that the
    teacher predicts on the un-rotated view.
    """

    supports_split_compile = False

    def __init__(self, **cfg):
        super().__init__(**cfg)
        # reference default (``pfst_v4.py:75``)
        self.feat_level = cfg.get('feat_level', 2)

    def teacher_and_mix(self, ema_params, ema_batch_stats, batch, rng,
                        mean, std, teacher_out=None):
        if teacher_out is None and 'target_img_ori' in batch:
            from ..utils.pfst_transforms import transform_by_metas
            ori = batch['target_img_ori']
            metas = {k: batch[k] for k in
                     ('rotate_k', 'flip_vertical', 'flip_horizontal')
                     if k in batch}
            ema_logits, ema_feats = self.teacher_forward(
                ema_params, ema_batch_stats, ori)
            img_h = ori.shape[1]
            ema_logits = transform_by_metas(ema_logits, metas,
                                            scale=1.0)
            if isinstance(ema_feats, (tuple, list)):
                # only the similarity-loss level is re-aligned, like
                # the reference (``pfst_v4.py:258``)
                lvl = self.feat_level
                feats = list(ema_feats)
                feats[lvl] = transform_by_metas(
                    feats[lvl], metas,
                    scale=feats[lvl].shape[1] / img_h)
                ema_feats = tuple(feats)
            else:
                ema_feats = transform_by_metas(
                    ema_feats, metas,
                    scale=ema_feats.shape[1] / img_h)
            teacher_out = (ema_logits, ema_feats)
        return super().teacher_and_mix(
            ema_params, ema_batch_stats, batch, rng, mean, std,
            teacher_out=teacher_out)
