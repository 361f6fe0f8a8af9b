from .checkpoint import (extract_student, load_checkpoint, load_meta,
                         save_checkpoint)
from .evaluation import (eval_metrics, intersect_and_union, mean_dice,
                         mean_fscore, mean_iou, pre_eval_to_metrics,
                         total_area_to_metrics)
from .optimizers import (build_lr_schedule, build_optimizer,
                         build_optimizers)
from ..utils.misc import add_prefix

__all__ = [
    'save_checkpoint', 'load_checkpoint', 'load_meta', 'extract_student',
    'eval_metrics', 'intersect_and_union', 'mean_iou', 'mean_dice',
    'mean_fscore', 'pre_eval_to_metrics', 'total_area_to_metrics',
    'build_optimizer', 'build_optimizers', 'build_lr_schedule',
    'add_prefix'
]
