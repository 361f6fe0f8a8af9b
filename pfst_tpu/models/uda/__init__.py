from .pfgst import PFGST, parse_losses
from .uda_decorator import UDADecorator, UDATrainState

__all__ = ['PFGST', 'UDADecorator', 'UDATrainState', 'parse_losses']
