"""Multi-scale flip TTA wrapper (mirror of
``datasets/pipelines/test_time_aug.py:10``)."""
from __future__ import annotations

import copy

from ..builder import PIPELINES
from .compose import Compose


@PIPELINES.register_module()
class MultiScaleFlipAug:

    def __init__(self, transforms, img_scale=None, img_ratios=None,
                 flip=False, flip_direction='horizontal'):
        self.transforms = Compose(transforms)
        if img_ratios is not None:
            img_ratios = img_ratios if isinstance(img_ratios, list) \
                else [img_ratios]
        if img_scale is None:
            self.img_scale = None
            self.img_ratios = img_ratios
            self.scale_key = 'scale_factor'
        elif isinstance(img_scale, tuple) and img_ratios is not None:
            self.img_scale = [(int(img_scale[0] * r),
                               int(img_scale[1] * r)) for r in img_ratios]
            self.scale_key = 'scale'
        else:
            self.img_scale = img_scale if isinstance(img_scale, list) \
                else [img_scale]
            self.scale_key = 'scale'
        self.flip = flip
        self.flip_direction = flip_direction if isinstance(
            flip_direction, list) else [flip_direction]

    def __call__(self, results):
        aug_data = []
        scales = self.img_scale if self.img_scale is not None \
            else (self.img_ratios or [1.0])
        flip_args = [(False, None)]
        if self.flip:
            flip_args += [(True, d) for d in self.flip_direction]
        for scale in scales:
            for do_flip, direction in flip_args:
                _results = copy.deepcopy(results)
                _results[self.scale_key] = scale
                _results['flip'] = do_flip
                _results['flip_direction'] = direction
                data = self.transforms(_results)
                if do_flip:
                    import numpy as np
                    for key in ['img']:
                        axis = 1 if direction == 'horizontal' else 0
                        data[key] = np.flip(data[key], axis=axis).copy()
                aug_data.append(data)
        out = {key: [d[key] for d in aug_data] for key in aug_data[0]}
        return out

    def __repr__(self):
        return (f'{self.__class__.__name__}(img_scale={self.img_scale}, '
                f'flip={self.flip})')
