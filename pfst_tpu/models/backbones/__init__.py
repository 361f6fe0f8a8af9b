from .mit import MiT, MixVisionTransformer
from .mobilenet import MobileNetV2, MobileNetV3
from .resnet import ResNet, ResNetV1c, ResNetV1d
from .resnext import ResNeXt
from .swin import SwinTransformer
from .unet import UNet

__all__ = [
    'ResNet', 'ResNetV1c', 'ResNetV1d', 'ResNeXt', 'MobileNetV2',
    'MobileNetV3', 'MixVisionTransformer', 'MiT', 'SwinTransformer',
    'UNet'
]
