"""Offline pseudo-label generation round trip: the standalone tool
(`tools/gen_pseudo_labels.py`, the PseudoLabelingHookV4 sweep) dumps
an h5 corpus with streamed per-class entropy thresholds, and
`LoadAnnotationsPseudoLabelsV2` consumes it."""
import os
import os.path as osp
import sys

import cv2
import h5py
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))

RATIO = 0.1


def _write_cfg(path, data_root):
    path.write_text(f"""
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(type='ResNetV1c', depth=18, num_stages=4,
                  base_channels=8, stem_channels=8,
                  out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                  strides=(1, 2, 1, 1), norm_cfg=norm_cfg,
                  contract_dilation=True),
    decode_head=dict(type='DepthwiseSeparableASPPHead', in_channels=64,
                     in_index=3, channels=16, dilations=(1, 6, 12, 18),
                     c1_in_channels=8, c1_channels=4, dropout_ratio=0.1,
                     num_classes=6, norm_cfg=norm_cfg,
                     align_corners=False,
                     loss_decode=dict(type='CrossEntropyLoss',
                                      use_sigmoid=False,
                                      loss_weight=1.0)),
    test_cfg=dict(mode='whole'))
img_norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)
data = dict(val=dict(
    type='ISPRSDataset', data_root='{data_root}',
    img_dir='img_dir/val', ann_dir='ann_dir/val',
    gt_seg_map_loader_cfg=dict(reduce_zero_label=True),
    pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='MultiScaleFlipAug', img_scale=(32, 32), flip=False,
             transforms=[
                 dict(type='Resize', keep_ratio=True),
                 dict(type='Normalize', **img_norm),
                 dict(type='ImageToTensor', keys=['img']),
                 dict(type='Collect', keys=['img']),
             ])
    ]))
""")


def test_gen_pseudo_labels_roundtrip(tmp_path):
    import jax
    import optax

    import gen_pseudo_labels
    from pfst_tpu.apis.train import SupervisedTrainer
    from pfst_tpu.core.checkpoint import save_checkpoint
    from pfst_tpu.models import build_segmentor

    from conftest import tiny_model_cfg

    root = tmp_path / 'data'
    rs = np.random.RandomState(0)
    os.makedirs(root / 'img_dir' / 'val')
    os.makedirs(root / 'ann_dir' / 'val')
    for i in range(3):
        cv2.imwrite(str(root / 'img_dir' / 'val' / f'v{i}.png'),
                    rs.randint(0, 255, (32, 32, 3), np.uint8))
        cv2.imwrite(str(root / 'ann_dir' / 'val' / f'v{i}.png'),
                    rs.randint(0, 7, (32, 32)).astype(np.uint8))

    algo = SupervisedTrainer(build_segmentor(tiny_model_cfg()))
    state = algo.init_state(jax.random.PRNGKey(0), (1, 32, 32, 3),
                            optax.adamw(1e-3))
    save_checkpoint(str(tmp_path / 'wd'), 1, jax.device_get(state))

    cfg_path = tmp_path / 'cfg.py'
    _write_cfg(cfg_path, str(root))
    out_dir = tmp_path / 'pl'
    gen_pseudo_labels.main([
        str(cfg_path), str(tmp_path / 'wd' / 'ckpt' / '1'),
        '--out-dir', str(out_dir), '--split', 'val',
        '--mean-sim', '0.6',
    ])

    files = sorted(os.listdir(out_dir))
    assert 'sigmas.json' in files
    h5s = [f for f in files if f.endswith('.h5')]
    assert len(h5s) == 3
    with h5py.File(out_dir / h5s[0]) as f:
        logits = f['seg_logits'][()]
        assert logits.shape == (6, 32, 32)
        thre = f[f'thre@{RATIO}'][()]
        assert thre.shape == (6,)
        # thresholds grow with the kept ratio and stay within the
        # entropy range [0, log 6]
        t_lo = f['thre@0.01'][()]
        t_hi = f['thre@0.5'][()]
        finite = np.isfinite(t_lo) & np.isfinite(t_hi)
        assert finite.any()
        assert (t_hi[finite] >= t_lo[finite] - 1e-6).all()
        assert (t_hi[finite] <= np.log(6) + 1e-3).all()

    # streamed histogram quantiles track exact quantiles per class
    ent_all, lbl_all = [], []
    for name in h5s:
        with h5py.File(out_dir / name) as f:
            lg = f['seg_logits'][()].astype(np.float32)
        e = lg - lg.max(0, keepdims=True)
        p = np.exp(e)
        p /= p.sum(0, keepdims=True)
        ent_all.append(-(p * np.log(p + 1e-12)).sum(0).ravel())
        lbl_all.append(p.argmax(0).ravel())
    ent, lbl = np.concatenate(ent_all), np.concatenate(lbl_all)
    for c in range(6):
        if (lbl == c).sum() == 0:
            continue
        exact = np.quantile(ent[lbl == c], RATIO)
        np.testing.assert_allclose(thre[c], exact, atol=2e-3)

    # the corpus feeds LoadAnnotationsPseudoLabelsV2
    from pfst_tpu.datasets.pipelines.loading import \
        LoadAnnotationsPseudoLabelsV2
    loader = LoadAnnotationsPseudoLabelsV2(
        pseudo_labels_dir=str(out_dir), pseudo_ratio=RATIO,
        reduce_zero_label=False, load_feats=False)
    png_name = h5s[0].replace('.h5', '.png')
    res = loader(dict(img=np.zeros((32, 32, 3), np.uint8),
                      filename=png_name,
                      img_info=dict(filename=png_name),
                      ann_info={}, seg_fields=[]))
    pl = res['gt_semantic_seg']
    assert pl.shape == (32, 32)
    assert set(np.unique(pl)) <= set(range(6)) | {255}
    # loader semantics: keep where entropy <= thre[predicted class],
    # else 255 (reference ``loading.py:435-521``)
    with h5py.File(out_dir / h5s[0]) as f:
        lg = f['seg_logits'][()].astype(np.float32)
        thre0 = f[f'thre@{RATIO}'][()]
    e = np.exp(lg - lg.max(0, keepdims=True))
    p = e / e.sum(0, keepdims=True)
    lab = p.argmax(0)
    ent0 = -(p * np.log(p + 1e-12)).sum(0)
    expect = np.where(ent0 <= thre0[lab], lab, 255).astype(np.uint8)
    np.testing.assert_array_equal(pl, expect)
