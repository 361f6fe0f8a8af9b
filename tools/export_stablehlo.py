#!/usr/bin/env python
"""Portable StableHLO export (deploy surface, mirror of the
reference's ``pytorch2onnx.py`` deploy tool — `/root/reference/tools/
pytorch2onnx.py` — re-targeted at the TPU-native interchange).

Where the reference serializes the model to ONNX for TensorRT, the
TPU-native portable artifact is a serialized ``jax.export.Exported``:
StableHLO bytecode plus calling convention, loadable by any
jax >= export-v1 process (CPU/GPU/TPU) with ``jax.export.deserialize``
— no Python model code, no config, no checkpoint needed at serving
time. Complements ``tools/export_savedmodel.py`` (TF Serving path).

The batch dimension is exported SYMBOLICALLY by default (serve any
batch size with one artifact); pass ``--batch N`` to pin it instead.

Usage:
    python tools/export_stablehlo.py <config> [checkpoint] \
        --output-file model.stablehlo [--shape 512 512] [--verify]

Round-trip verified in ``tests/test_export_stablehlo.py``.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))

from pfst_tpu.utils import Config, DictAction


def build_infer(cfg, checkpoint=None, shape=(512, 512)):
    """Build ``(infer_fn, variables)`` for export: probs + labels."""
    import jax
    import jax.numpy as jnp
    from pfst_tpu.models import build_segmentor

    model_cfg = dict(cfg.model)
    model_cfg['pretrained'] = None
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    h, w = shape
    if checkpoint:
        from pfst_tpu.core.checkpoint import (extract_student,
                                              load_checkpoint)
        variables = extract_student(load_checkpoint(checkpoint))
    else:
        variables = model.init({'params': jax.random.PRNGKey(0)},
                               jnp.zeros((1, h, w, 3)), train=False)

    def infer(img):
        probs, _ = model.apply(variables, img, method=model.inference)
        return {'probs': probs,
                'labels': jnp.argmax(probs, axis=-1).astype(jnp.int32)}

    return infer, variables


def export_bytes(cfg, checkpoint=None, shape=(512, 512), batch=None,
                 platforms=None):
    """Serialize the inference function; returns ``bytes``.

    ``batch=None`` exports a symbolic batch dimension so one artifact
    serves every batch size; an int pins it. ``platforms`` defaults to
    the current backend (pass e.g. ``['tpu', 'cpu']`` for a
    multi-platform artifact).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    infer, _ = build_infer(cfg, checkpoint, shape)
    h, w = shape
    if batch is None:
        (b,) = jexport.symbolic_shape('b')
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    exp = jexport.export(jax.jit(infer), platforms=platforms)(spec)
    return exp.serialize()


def main(args=None):
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--output-file', default='model.stablehlo')
    p.add_argument('--shape', type=int, nargs='+', default=[512, 512])
    p.add_argument('--batch', type=int, default=None,
                   help='pin the batch dim (default: symbolic)')
    p.add_argument('--platforms', nargs='+', default=None,
                   help="lowering platforms, e.g. --platforms tpu cpu")
    p.add_argument('--verify', action='store_true',
                   help='deserialize and check against direct apply')
    p.add_argument('--cfg-options', nargs='+', action=DictAction)
    a = p.parse_args(args)
    cfg = Config.fromfile(a.config)
    if a.cfg_options:
        cfg.merge_from_dict(a.cfg_options)
    shape = tuple((a.shape * 2)[:2])

    blob = export_bytes(cfg, a.checkpoint, shape, a.batch, a.platforms)
    with open(a.output_file, 'wb') as f:
        f.write(blob)
    print(f'StableHLO artifact written to {a.output_file} '
          f'({len(blob)/1e6:.1f} MB)')

    if a.verify:
        import numpy as np
        import jax
        from jax import export as jexport
        if a.platforms and jax.default_backend() not in a.platforms:
            # exp.call can only run on a platform the artifact was
            # lowered for; e.g. `--platforms tpu` from a CPU process
            # has nothing local to execute against.
            print(f'verify: skipped — artifact lowered for '
                  f'{a.platforms}, current backend is '
                  f'{jax.default_backend()!r}')
            return
        exp = jexport.deserialize(blob)
        infer, _ = build_infer(cfg, a.checkpoint, shape)
        x = np.random.RandomState(0).rand(
            a.batch or 2, *shape, 3).astype('float32')
        got = jax.jit(exp.call)(x)
        want = jax.jit(infer)(x)
        got_p = np.asarray(got['probs'])
        want_p = np.asarray(want['probs'])
        np.testing.assert_allclose(got_p, want_p, rtol=2e-5, atol=2e-5)
        # labels: the two executables may fuse differently, so pixels
        # whose top-2 prob margin is inside the prob tolerance can
        # legitimately argmax apart — compare only decided pixels.
        top2 = np.partition(want_p, -2, axis=-1)[..., -2:]
        decided = (top2[..., 1] - top2[..., 0]) > 4e-5
        same = (np.asarray(got['labels'])
                == np.asarray(want['labels'])) | ~decided
        assert same.all(), (
            f'{(~same).sum()} decided pixels changed label')
        print('verify: deserialized artifact matches direct apply')


if __name__ == '__main__':
    main()
