"""Model registries and builders.

Mirrors ``rsiseg/models/builder.py:8-17,56-74``: one ``MODELS`` registry
aliased as BACKBONES/NECKS/HEADS/LOSSES/SEGMENTORS/DISCRIMINATORS/UDA,
plus ``build_train_model`` which dispatches ``cfg.uda`` vs ``cfg.model``
and injects the inner model + ``max_iters`` into the UDA wrapper cfg.
"""
from __future__ import annotations

import copy

from ..utils.registry import Registry

MODELS = Registry('models')

BACKBONES = MODELS
NECKS = MODELS
HEADS = MODELS
LOSSES = MODELS
SEGMENTORS = MODELS
DISCRIMINATORS = MODELS
UDA = MODELS


def build_backbone(cfg):
    return BACKBONES.build(cfg)


def build_neck(cfg):
    return NECKS.build(cfg)


def build_head(cfg):
    return HEADS.build(cfg)


def build_loss(cfg):
    return LOSSES.build(cfg)


def build_discriminator(cfg):
    return DISCRIMINATORS.build(cfg)


def build_segmentor(cfg, train_cfg=None, test_cfg=None):
    """Build a segmentor module from config.

    ``cfg['dtype']`` may be a string (``'bfloat16'`` in config files
    enables mixed-precision compute: bf16 activations/matmuls, fp32
    params/BN statistics, fp32 losses)."""
    cfg = copy.deepcopy(cfg)
    if isinstance(cfg.get('dtype'), str):
        import jax.numpy as jnp
        cfg['dtype'] = jnp.dtype(cfg['dtype'])
    if train_cfg is not None or test_cfg is not None:
        assert cfg.get('train_cfg') is None or train_cfg is None, \
            'train_cfg specified in both outer field and segmentor field'
        assert cfg.get('test_cfg') is None or test_cfg is None, \
            'test_cfg specified in both outer field and segmentor field'
    if train_cfg is not None:
        cfg['train_cfg'] = train_cfg
    if test_cfg is not None:
        cfg['test_cfg'] = test_cfg
    return SEGMENTORS.build(cfg)


def build_train_model(cfg, train_cfg=None, test_cfg=None):
    """Build the training-time model.

    If ``cfg.uda`` is present (self-training run) the inner segmentor
    config and the runner's ``max_iters`` are injected into the UDA
    algorithm config (reference: ``models/builder.py:56-74``).
    """
    cfg = copy.deepcopy(cfg if isinstance(cfg, dict) else cfg.to_dict())
    if 'uda' in cfg and cfg['uda'] is not None:
        uda_cfg = copy.deepcopy(cfg['uda'])
        uda_cfg['model'] = copy.deepcopy(cfg['model'])
        if 'max_iters' not in uda_cfg:
            uda_cfg['max_iters'] = cfg['runner']['max_iters']
        return UDA.build(uda_cfg)
    return build_segmentor(cfg['model'], train_cfg=train_cfg,
                           test_cfg=test_cfg)
