from .aspp_head import ASPPHead, DepthwiseSeparableASPPHead
from .attention_heads import DAHead, GCHead, NLHead
from .context_heads import (ANNHead, APCHead, DMHead, DNLHead, EMAHead,
                            OCRHead)
from .enc_head import EncHead
from .fcn_head import (DepthwiseSeparableFCNHead, FCNHead,
                       FPNHead)
from .isa_cc_heads import CCHead, ISAHead, PSAHead
from .lraspp_head import LRASPPHead
from .point_rend import (DPTHead, IterativeDecodeHead, PointRendHead,
                         STDCHead)
from .psp_head import PSPHead
from .segformer_head import SegformerHead
from .transformer_heads import (SegmenterMaskTransformerHead,
                                SETRMLAHead, SETRUPHead)
from .uper_head import UPerHead

__all__ = [
    'ASPPHead', 'DepthwiseSeparableASPPHead', 'FCNHead', 'FPNHead', 'DepthwiseSeparableFCNHead', 'PSPHead',
    'UPerHead', 'SegformerHead', 'LRASPPHead', 'DAHead', 'NLHead',
    'GCHead', 'OCRHead', 'DNLHead', 'ANNHead', 'APCHead', 'DMHead',
    'EMAHead', 'EncHead', 'SETRUPHead', 'SETRMLAHead',
    'SegmenterMaskTransformerHead', 'ISAHead', 'CCHead', 'PSAHead', 'PointRendHead', 'STDCHead',
    'DPTHead', 'IterativeDecodeHead'
]
