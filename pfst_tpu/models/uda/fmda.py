"""FMDA (mirror of ``rsiseg/models/uda/fmda.py`` / ``fmda_mix.py``).

Target self-training without ClassMix: the whole target image is
strongly augmented and trained against the teacher's pseudo labels
(losses prefixed ``trg``, ``fmda.py:309-325``), with the PFGST-style
aux losses on the collected tensors.  The Fourier-amplitude mixing of
``FMDAMix`` lives in the data pipeline in the reference; the algorithm
step is identical.
"""
from __future__ import annotations

from ..builder import UDA
from .pfgst import PFGST


@UDA.register_module()
class FMDA(PFGST):
    target_self_training = True

    def __init__(self, **cfg):
        cfg.setdefault('use_decoded_feats', False)
        super().__init__(**cfg)


@UDA.register_module()
class FMDAMix(FMDA):
    """(``fmda_mix.py:54``) — amplitude-mix handled by the pipeline."""
