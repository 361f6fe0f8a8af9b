"""StableHLO deploy export (`tools/export_stablehlo.py`) — the
TPU-native counterpart of the reference's ONNX deploy path
(`/root/reference/tools/pytorch2onnx.py`): serialize → deserialize →
run with NO model code, and match the direct apply bitways."""
import os.path as osp
import sys

import numpy as np

from pfst_tpu.utils.config import Config

from conftest import tiny_model_cfg

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))


def _cfg():
    return Config(dict(model=tiny_model_cfg()))


def test_symbolic_batch_roundtrip(tmp_path):
    """One artifact with a symbolic batch dim serves batch 1 AND 3,
    matching the direct model apply."""
    import jax
    from jax import export as jexport

    import export_stablehlo as es

    shape = (32, 32)
    cfg = _cfg()
    blob = es.export_bytes(cfg, shape=shape, batch=None)
    # artifact is self-contained bytes: files round-trip it
    p = tmp_path / 'm.stablehlo'
    p.write_bytes(blob)
    exp = jexport.deserialize(p.read_bytes())

    infer, _ = es.build_infer(cfg, shape=shape)
    rng = np.random.RandomState(0)
    for b in (1, 3):
        x = rng.rand(b, *shape, 3).astype('float32')
        got = jax.jit(exp.call)(x)
        want = jax.jit(infer)(x)
        np.testing.assert_allclose(np.asarray(got['probs']),
                                   np.asarray(want['probs']),
                                   rtol=2e-5, atol=2e-5)
        assert got['labels'].shape == (b, *shape)
        # near-tie pixels may argmax apart across XLA fusions; only
        # pixels whose top-2 margin clears the prob tolerance must
        # agree (mirrors tools/export_stablehlo.py --verify)
        wp = np.asarray(want['probs'])
        top2 = np.partition(wp, -2, axis=-1)[..., -2:]
        decided = (top2[..., 1] - top2[..., 0]) > 4e-5
        same = (np.asarray(got['labels'])
                == np.asarray(want['labels'])) | ~decided
        assert same.all(), f'{(~same).sum()} decided pixels differ'


def test_cli_writes_and_verifies(tmp_path):
    """The CLI path end-to-end, pinned batch, --verify on."""
    import export_stablehlo as es

    cfg_file = tmp_path / 'cfg.py'
    cfg_file.write_text(f'model = {tiny_model_cfg()!r}\n')
    out = tmp_path / 'm.stablehlo'
    es.main([str(cfg_file), '--output-file', str(out),
             '--shape', '32', '--batch', '2', '--verify'])
    assert out.stat().st_size > 0
