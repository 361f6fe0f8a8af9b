from .compose import Compose
from .formatting import Collect, DefaultFormatBundle, ImageToTensor
from .loading import (AnnotationMapperInria, LoadAnnotations,
                      LoadAnnotationsDepth, LoadAnnotationsGTA,
                      LoadAnnotationsPseudoLabels,
                      LoadAnnotationsPseudoLabelsV2, LoadImageFromFile)
from .test_time_aug import MultiScaleFlipAug
from .transforms import (CLAHE, AdjustGamma, ClipNormalize,
                         DeferNormalize,
                         MultiDomainClipNormalize, Normalize, Pad,
                         PercentileNormalize, PhotoMetricDistortion,
                         RandomCrop, RandomFlip, RandomRotate,
                         RandomRotate90, Rerange, Resize, RGB2Gray,
                         SegRescale, StrongAugmentation, Uint82Float)

__all__ = [
    'Compose', 'Collect', 'DefaultFormatBundle', 'ImageToTensor',
    'LoadImageFromFile', 'LoadAnnotations', 'LoadAnnotationsPseudoLabels',
    'LoadAnnotationsGTA', 'LoadAnnotationsDepth',
    'LoadAnnotationsPseudoLabelsV2', 'AnnotationMapperInria',
    'MultiScaleFlipAug', 'Resize', 'RandomCrop', 'RandomFlip',
    'RandomRotate90', 'RandomRotate', 'Pad', 'Normalize', 'DeferNormalize',
    'ClipNormalize',
    'PercentileNormalize', 'MultiDomainClipNormalize', 'Rerange', 'CLAHE',
    'RGB2Gray', 'AdjustGamma', 'SegRescale', 'Uint82Float',
    'PhotoMetricDistortion', 'StrongAugmentation'
]
