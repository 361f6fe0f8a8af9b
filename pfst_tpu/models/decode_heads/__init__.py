from .aspp_head import ASPPHead, DepthwiseSeparableASPPHead
from .attention_heads import DAHead, GCHead, NLHead
from .fcn_head import FCNHead
from .lraspp_head import LRASPPHead
from .psp_head import PSPHead
from .segformer_head import SegformerHead
from .uper_head import UPerHead

__all__ = [
    'ASPPHead', 'DepthwiseSeparableASPPHead', 'FCNHead', 'PSPHead',
    'UPerHead', 'SegformerHead', 'LRASPPHead', 'DAHead', 'NLHead',
    'GCHead'
]
