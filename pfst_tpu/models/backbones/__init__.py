from .convnext import ConvNeXt
from .fast_cnns import (BiSeNetV1, BiSeNetV2, CGNet, ERFNet, FastSCNN,
                        ICNet, STDCNet)
from .hrnet import HRNet
from .mit import MiT, MixVisionTransformer
from .mobilenet import MobileNetV2, MobileNetV3
from .resnest import ResNeSt
from .resnet import ResNet, ResNetV1c, ResNetV1d
from .resnext import ResNeXt
from .swin import SwinTransformer
from .timm_backbone import TIMMBackbone
from .twins import PCPVT, SVT
from .unet import UNet
from .beit import BEiT, MAE
from .vit import VisionTransformer

__all__ = [
    'ResNet', 'ResNetV1c', 'ResNetV1d', 'ResNeXt', 'MobileNetV2',
    'MobileNetV3', 'MixVisionTransformer', 'MiT', 'SwinTransformer',
    'UNet', 'HRNet', 'VisionTransformer', 'BEiT', 'MAE', 'FastSCNN',
    'CGNet', 'ERFNet', 'STDCNet', 'BiSeNetV1', 'BiSeNetV2', 'ICNet',
    'ResNeSt', 'PCPVT', 'SVT', 'TIMMBackbone', 'ConvNeXt'
]
