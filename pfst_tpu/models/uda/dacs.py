"""DACS baseline (mirror of ``rsiseg/models/uda/dacs.py``).

Same fused step as PFGST minus the PFGST aux losses, mixing the *plain*
target view (``dacs.py:253``) and with the optional frozen-ImageNet
feature-distance regulariser (``dacs.py:151-161,204-211``).  The
reference runs separate ``backward()`` calls per loss; under JAX the
single ``value_and_grad`` over the summed loss is gradient-identical.
"""
from __future__ import annotations

from ..builder import UDA
from .pfgst import PFGST


@UDA.register_module()
class DACS(PFGST):
    mix_view = 'target'

    def __init__(self, **cfg):
        cfg.setdefault('aux_losses', None)
        cfg.setdefault('use_decoded_feats', False)
        cfg.setdefault('thre_type', 'all')
        super().__init__(**cfg)
