from .domain_adaptor import (DomainAdaptor, DomainAdaptorAdv,
                             DomainAdaptorV2, FMDAAdaptor, FMDAAdaptorV2)
from .encoder_decoder import EncoderDecoder

__all__ = ['EncoderDecoder', 'DomainAdaptor', 'DomainAdaptorAdv',
           'DomainAdaptorV2', 'FMDAAdaptor', 'FMDAAdaptorV2']
