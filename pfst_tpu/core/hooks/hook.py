"""Minimal training-callback protocol.

TPU-native replacement for mmcv's hook inversion-of-control
(``rsiseg/core/hook/``): the explicit train loop calls a narrow set of
callbacks with plain data — no runner object, no priorities.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

from ...utils.registry import Registry

HOOKS = Registry('hooks')


def build_hook(cfg):
    return HOOKS.build(dict(cfg))


class Hook:
    """Override any subset; all receive plain dicts."""

    def before_run(self, ctx: Dict[str, Any]):
        pass

    def after_train_iter(self, ctx: Dict[str, Any],
                         log_vars: Dict[str, float],
                         vis_states: Optional[Dict[str, Any]] = None):
        pass

    def after_eval(self, ctx: Dict[str, Any],
                   metrics: Dict[str, float]):
        pass

    def after_run(self, ctx: Dict[str, Any]):
        pass
