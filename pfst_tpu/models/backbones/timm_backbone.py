"""timm adapter (mirror of ``rsiseg/models/backbones/timm_backbone.py``).

The reference wraps pytorch-image-models feature extractors.  In this
framework the adapter resolves a *registered* backbone by timm-style
model name so configs written against the timm adapter keep working
without the torch dependency; unknown names raise with the mapping
table to extend.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES, build_backbone

_TIMM_MAP = {
    'resnet18': dict(type='ResNet', depth=18),
    'resnet34': dict(type='ResNet', depth=34),
    'resnet50': dict(type='ResNet', depth=50),
    'resnet101': dict(type='ResNet', depth=101),
    'resnest50d': dict(type='ResNeSt', depth=50),
    'mobilenetv2_100': dict(type='MobileNetV2'),
    'mobilenetv3_large_100': dict(type='MobileNetV3', arch='large'),
    'swin_tiny_patch4_window7_224': dict(type='SwinTransformer'),
    'vit_base_patch16_224': dict(type='VisionTransformer'),
}


@BACKBONES.register_module()
class TIMMBackbone(nn.Module):
    model_name: str = 'resnet50'
    features_only: bool = True
    pretrained: Optional[Any] = None
    in_channels: int = 3
    init_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    def setup(self):
        if self.model_name not in _TIMM_MAP:
            raise KeyError(
                f'timm model {self.model_name!r} has no registered '
                f'equivalent; extend _TIMM_MAP in '
                f'pfst_tpu/models/backbones/timm_backbone.py. '
                f'Known: {sorted(_TIMM_MAP)}')
        cfg = dict(_TIMM_MAP[self.model_name])
        if self.norm_cfg is not None:
            cfg.setdefault('norm_cfg', self.norm_cfg)
        cfg['dtype'] = self.dtype
        self.inner = build_backbone(cfg)

    def __call__(self, x, train: bool = False):
        return self.inner(x, train=train)
