"""Single-image inference API (mirror of ``rsiseg/apis/inference.py``,
with the reference's broken ``LoadImage`` import fixed by construction).
"""
from __future__ import annotations

from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import extract_student, load_checkpoint
from ..datasets.pipelines import Compose
from ..models import build_segmentor
from ..utils.config import Config


def init_segmentor(config: Union[str, Config],
                   checkpoint: Optional[str] = None):
    """Build a segmentor (+variables) from config/checkpoint."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    model_cfg = dict(config.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    test_cfg = model_cfg.pop('test_cfg', None)
    model = build_segmentor(model_cfg, test_cfg=test_cfg)
    variables = None
    if checkpoint is not None:
        restored = load_checkpoint(checkpoint)
        variables = extract_student(restored)
    model.cfg = config
    return model, variables


def inference_segmentor(model, variables, img, apply_fn=None):
    """img: path or HWC array -> predicted label map (H, W).

    ``apply_fn(variables, batch_img) -> (probs, aux)`` overrides the
    plain ``model.apply`` call — pass a jitted/cached closure (see
    ``tools/serve.py``) to amortize compilation across requests.
    """
    cfg = model.cfg
    pipeline = list(cfg.data['test']['pipeline'])
    if isinstance(img, np.ndarray):
        pipeline = pipeline[1:]
        data = dict(img=img, img_shape=img.shape, ori_shape=img.shape,
                    img_fields=['img'], seg_fields=[],
                    filename=None, ori_filename=None, scale_factor=1.0)
    else:
        data = dict(img_info=dict(filename=img), img_prefix=None,
                    seg_prefix=None, seg_fields=[])
    data = Compose(pipeline)(data)
    imgs = data['img'] if isinstance(data['img'], list) else [data['img']]
    if apply_fn is None:
        apply_fn = lambda v, im: model.apply(  # noqa: E731
            v, im, method=model.inference)
    probs = None
    for im in imgs:
        p, _ = apply_fn(variables, jnp.asarray(im)[None])
        probs = p if probs is None else probs + p
    return np.asarray(jnp.argmax(probs, axis=-1)[0])


def show_result_pyplot(model, img, result, palette=None, opacity=0.5):
    """Overlay prediction on the image (``apis/inference.py:75-109``)."""
    import cv2
    if isinstance(img, str):
        img = cv2.imread(img)
    palette = np.array(palette if palette is not None else
                       np.random.RandomState(42).randint(
                           0, 255, (int(result.max()) + 1, 3)))
    color = palette[result]
    out = (img * (1 - opacity) + color * opacity).astype(np.uint8)
    return out
