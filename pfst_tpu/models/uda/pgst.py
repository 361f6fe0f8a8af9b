"""PGST family (mirror of ``rsiseg/models/uda/pgst*.py``).

``PGST`` (``pgst.py:54``): PFGST's predecessor — additionally
ClassMix-blends the teacher's feature map with the detached source
feature map at ``feat_level`` before the similarity losses
(``pgst.py:108-115``).  ``PGSTTRG`` drops mixing and self-trains on the
strongly-augmented target (``pgst_trg.py``).  ``PGSTV4`` /
``PGSTMixFeat`` are incremental variants sharing the same fused step.
"""
from __future__ import annotations

from ..builder import UDA
from .pfgst import PFGST


@UDA.register_module()
class PGST(PFGST):

    def __init__(self, **cfg):
        cfg.setdefault('use_decoded_feats', False)
        super().__init__(**cfg)
        # reference default (``pgst.py:74``)
        self.feat_level = cfg.get('feat_level', 2)

    @property
    def mix_ema_feat_level(self):
        return self.feat_level


@UDA.register_module()
class PGSTTRG(PFGST):
    """(``pgst_trg.py``) target self-training on the data pipeline's
    strongly-augmented view AS-IS: the student trains directly on
    ``target_img_strong_aug`` against the raw pseudo-labels
    (``pgst_trg.py:270-279``) — unlike FMDA, NO in-step
    ``strong_transform`` jitter/blur is applied, and the quality
    weight map stays untransformed."""

    target_self_training = True
    self_training_view = 'pipeline_strong'

    def __init__(self, **cfg):
        cfg.setdefault('use_decoded_feats', False)
        super().__init__(**cfg)


@UDA.register_module()
class PGSTV4(PGST):
    """(``pgst_v4.py``) PGST *without* the ema-feature mask mixing:
    the aux losses consume the raw teacher features
    (``pgst_v4.py``: ``x_ema=ema_feats``, no ``mixed_ema_feats``)."""

    @property
    def mix_ema_feat_level(self):
        return None


@UDA.register_module()
class PGSTMixFeat(PGST):
    """(``pgst_mix_feat.py:54,289-295``) instead of mask-mixing the
    teacher/student feature maps, the EMA model runs a second forward
    on the mixed image and those features feed the aux losses."""

    mix_feat_teacher_forward = True

    @property
    def mix_ema_feat_level(self):
        return None
