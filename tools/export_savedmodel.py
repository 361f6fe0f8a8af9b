#!/usr/bin/env python
"""Deployment export (capability mirror of the reference's
``pytorch2onnx.py`` / ``pytorch2torchscript.py`` deploy tools).

Exports the jitted inference function as a TensorFlow SavedModel via
``jax2tf`` — the TPU-native deployment interchange (servable by TF
Serving / convertible to TFLite), replacing the ONNX/TensorRT path.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from pfst_tpu.utils import Config, DictAction


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--output-file', default='exported_model')
    p.add_argument('--shape', type=int, nargs='+', default=[512, 512])
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    a = p.parse_args(args)
    cfg = Config.fromfile(a.config)
    if a.cfg_options:
        cfg.merge_from_dict(a.cfg_options)
    h, w = (a.shape * 2)[:2]

    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from jax.experimental import jax2tf
    from pfst_tpu.models import build_segmentor

    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    if a.checkpoint:
        from pfst_tpu.core.checkpoint import (extract_student,
                                              load_checkpoint)
        variables = extract_student(load_checkpoint(a.checkpoint))
    else:
        variables = model.init({'params': jax.random.PRNGKey(0)},
                               jnp.zeros((1, h, w, 3)), train=False)

    def infer(img):
        probs, _ = model.apply(variables, img, method=model.inference)
        return jnp.argmax(probs, axis=-1)

    tf_fn = tf.function(
        jax2tf.convert(infer, with_gradient=False),
        input_signature=[tf.TensorSpec([1, h, w, 3], tf.float32)],
        autograph=False)
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(module, a.output_file)
    print(f'SavedModel written to {a.output_file}')


if __name__ == '__main__':
    main()
