from .cascade_encoder_decoder import CascadeEncoderDecoder
from .domain_adaptor import (DomainAdaptor, DomainAdaptorAdv,
                             DomainAdaptorV2, FMDAAdaptor, FMDAAdaptorV2)
from .encoder_decoder import EncoderDecoder

__all__ = ['EncoderDecoder', 'CascadeEncoderDecoder', 'DomainAdaptor',
           'DomainAdaptorAdv', 'DomainAdaptorV2', 'FMDAAdaptor',
           'FMDAAdaptorV2']
