from .hook import HOOKS, Hook, build_hook
from .loggers import (ProfilerHook, TensorboardLoggerHook,
                      TextLoggerHook, WandbHookSeg)
from .plot_statistics_hook import (PlotMultiClassStatisticsHook,
                                   PlotStatisticsHook)
from .pseudo_labeling_hook import (PseudoLabelingHook,
                                   PseudoLabelingHookV2,
                                   PseudoLabelingHookV3,
                                   PseudoLabelingHookV4)
from .rare_class_sampling_hook import RareClassSamplingHook

__all__ = [
    'HOOKS', 'Hook', 'build_hook', 'TextLoggerHook',
    'TensorboardLoggerHook', 'WandbHookSeg', 'ProfilerHook', 'PlotStatisticsHook',
    'PlotMultiClassStatisticsHook', 'RareClassSamplingHook',
    'PseudoLabelingHook', 'PseudoLabelingHookV2', 'PseudoLabelingHookV3',
    'PseudoLabelingHookV4'
]
