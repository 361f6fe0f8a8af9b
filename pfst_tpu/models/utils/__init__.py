from .layers import (ConvModule, DepthwiseSeparableConvModule, Norm,
                     build_act)

__all__ = ['ConvModule', 'DepthwiseSeparableConvModule', 'Norm',
           'build_act']
