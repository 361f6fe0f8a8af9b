from .inference import (inference_segmentor, init_segmentor,
                        show_result_pyplot)
from .test import multi_gpu_test, single_gpu_test
from .train import (SupervisedTrainer, build_algorithm, init_random_seed,
                    set_random_seed, train_segmentor)

__all__ = [
    'train_segmentor', 'init_random_seed', 'set_random_seed',
    'single_gpu_test', 'multi_gpu_test', 'init_segmentor',
    'inference_segmentor', 'show_result_pyplot', 'SupervisedTrainer',
    'build_algorithm'
]
