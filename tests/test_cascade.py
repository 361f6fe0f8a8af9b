"""CascadeEncoderDecoder (reference ``cascade_encoder_decoder.py``):
FCN->OCR and FPN->PointRend cascades with decode_0/decode_1 losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfst_tpu.models import build_segmentor

NORM = dict(type='BN', requires_grad=True)


def _tiny_backbone():
    return dict(type='ResNetV1c', depth=18, num_stages=4,
                base_channels=8, stem_channels=8,
                out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                strides=(1, 2, 1, 1), norm_cfg=NORM,
                contract_dilation=True)


def _ocr_cascade_cfg():
    return dict(
        type='CascadeEncoderDecoder', num_stages=2,
        backbone=_tiny_backbone(),
        decode_head=[
            dict(type='FCNHead', in_channels=32, in_index=2,
                 channels=16, num_convs=1, concat_input=False,
                 dropout_ratio=0.1, num_classes=6, norm_cfg=NORM,
                 align_corners=False,
                 loss_decode=dict(type='CrossEntropyLoss',
                                  use_sigmoid=False, loss_weight=0.4)),
            dict(type='OCRHead', in_channels=64, in_index=3,
                 channels=16, ocr_channels=8, dropout_ratio=0.1,
                 num_classes=6, norm_cfg=NORM, align_corners=False,
                 loss_decode=dict(type='CrossEntropyLoss',
                                  use_sigmoid=False, loss_weight=1.0)),
        ],
        train_cfg=dict(), test_cfg=dict(mode='whole'))


def _pointrend_cascade_cfg():
    return dict(
        type='CascadeEncoderDecoder', num_stages=2,
        backbone=dict(type='ResNetV1c', depth=18, num_stages=4,
                      base_channels=8, stem_channels=8,
                      out_indices=(0, 1, 2, 3),
                      dilations=(1, 1, 1, 1), strides=(1, 2, 2, 2),
                      norm_cfg=NORM),
        neck=dict(type='FPN', in_channels=(8, 16, 32, 64),
                  out_channels=16, num_outs=4),
        decode_head=[
            dict(type='FPNHead', in_channels=(16, 16, 16, 16),
                 in_index=(0, 1, 2, 3),
                 feature_strides=(4, 8, 16, 32), channels=8,
                 dropout_ratio=-1, num_classes=6, norm_cfg=NORM,
                 align_corners=False,
                 loss_decode=dict(type='CrossEntropyLoss',
                                  use_sigmoid=False, loss_weight=1.0)),
            dict(type='PointHead', in_channels=(16,), in_index=(0,),
                 channels=16, num_fcs=3, num_points=32,
                 coarse_pred_each_layer=True, dropout_ratio=-1,
                 num_classes=6, align_corners=False,
                 loss_decode=dict(type='CrossEntropyLoss',
                                  use_sigmoid=False, loss_weight=1.0)),
        ],
        train_cfg=dict(num_points=32, oversample_ratio=3,
                       importance_sample_ratio=0.75),
        test_cfg=dict(mode='whole'))


@pytest.mark.parametrize('cfg_fn,point', [
    (_ocr_cascade_cfg, False),
    (_pointrend_cascade_cfg, True),
], ids=['ocr', 'pointrend'])
def test_cascade_train_and_infer(cfg_fn, point):
    model = build_segmentor(cfg_fn())
    img = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                      jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).randint(0, 6, (2, 32, 32)))
    variables = model.init({'params': jax.random.PRNGKey(0)}, img,
                           train=False)

    (losses, states), _ = model.apply(
        variables, img, gt, train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(1)},
        method=model.forward_train)
    if point:
        assert 'decode_0.loss_ce' in losses
        assert 'decode_1.pointloss_ce' in losses
        assert 'decode_1.acc_point' in losses
    else:
        assert 'decode_0.loss_ce' in losses
        assert 'decode_1.loss_ce' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    probs, _ = model.apply(variables, img, method=model.inference)
    assert probs.shape == (2, 32, 32, 6)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1)), 1.0,
                               atol=1e-4)


def test_cascade_configs_build():
    from pfst_tpu.utils.config import Config
    for name in ('ocrnet_r50-d8', 'ocrnet_hr18', 'pointrend_r50'):
        cfg = Config.fromfile(f'configs/_base_/models/{name}.py')
        mc = dict(cfg.model)
        mc.pop('pretrained', None)
        model = build_segmentor(mc)
        assert model.num_classes == 19
        assert len(model.decode_head) == 2
