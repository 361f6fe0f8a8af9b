from .builder import (BACKBONES, DISCRIMINATORS, HEADS, LOSSES, MODELS,
                      NECKS, SEGMENTORS, UDA, build_backbone,
                      build_discriminator, build_head, build_loss,
                      build_neck, build_segmentor, build_train_model)
from . import backbones  # noqa: F401
from . import decode_heads  # noqa: F401
from . import losses  # noqa: F401
from . import necks  # noqa: F401
from . import segmentors  # noqa: F401
from . import uda  # noqa: F401
from . import discriminators  # noqa: F401

__all__ = [
    'MODELS', 'BACKBONES', 'NECKS', 'HEADS', 'LOSSES', 'SEGMENTORS',
    'DISCRIMINATORS', 'UDA', 'build_backbone', 'build_neck', 'build_head',
    'build_loss', 'build_segmentor', 'build_discriminator',
    'build_train_model'
]
