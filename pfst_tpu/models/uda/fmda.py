"""FMDA (mirror of ``rsiseg/models/uda/fmda.py`` / ``fmda_mix.py``).

``FMDA`` (``fmda.py:177-``): target self-training without ClassMix —
the whole target image is strongly augmented (``'mix': None``) and
trained against the teacher's pseudo labels (losses prefixed ``trg``,
``fmda.py:309-325``), with the PFGST-style aux losses on the collected
tensors.

``FMDAMix`` (``fmda_mix.py:54,268-283``) is *not* a self-training
variant: it runs ClassMix plus the PGST-style mask mixing of
stop-grad(student source features) with the teacher features at
``feat_level`` (default 2) — PGST step semantics except that the
student's mixed image blends the PLAIN target view
(``fmda_mix.py:274``), not the strong-aug view.
(Despite the name, no Fourier op exists anywhere in the reference.)
"""
from __future__ import annotations

from ..builder import UDA
from .pfgst import PFGST
from .pgst import PGST


@UDA.register_module()
class FMDA(PFGST):
    target_self_training = True

    def __init__(self, **cfg):
        cfg.setdefault('use_decoded_feats', False)
        super().__init__(**cfg)


@UDA.register_module()
class FMDAMix(PGST):
    """ClassMix + ema-feature mask mixing at ``feat_level``
    (``fmda_mix.py:268-283``; reference default feat_level=2).

    Unlike PGST/PFGST, the student's mixed image blends the PLAIN
    target view — ``data=torch.stack((img[i], target_img[i]))`` at
    ``fmda_mix.py:274`` — not ``target_img_strong_aug``."""

    mix_view = 'target'

    def __init__(self, **cfg):
        cfg.setdefault('feat_level', 2)
        super().__init__(**cfg)
