from .aspp_head import ASPPHead, DepthwiseSeparableASPPHead
from .fcn_head import FCNHead
from .psp_head import PSPHead

__all__ = ['ASPPHead', 'DepthwiseSeparableASPPHead', 'FCNHead', 'PSPHead']
