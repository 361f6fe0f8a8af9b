"""Smoke tests: third wave (transformer/ISA/CC/PSA/Enc heads, fast
CNN backbones)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfst_tpu.models import build_backbone, build_head

RNG = jax.random.PRNGKey(0)
NORM = dict(type='BN')


def _pyramid(chs=(8, 16, 32, 64), sizes=(16, 8, 4, 2)):
    return tuple(
        jnp.asarray(np.random.RandomState(i).randn(1, s, s, c),
                    jnp.float32) for i, (c, s) in enumerate(
                        zip(chs, sizes)))


@pytest.mark.parametrize('cfg', [
    dict(type='ISAHead', in_channels=64, in_index=3, channels=8,
         isa_channels=8, down_factor=(2, 2), num_classes=5,
         norm_cfg=NORM),
    dict(type='CCHead', in_channels=64, in_index=3, channels=8,
         num_classes=5, norm_cfg=NORM),
    dict(type='PSAHead', in_channels=64, in_index=3, channels=8,
         num_classes=5, norm_cfg=NORM),
    dict(type='EncHead', in_channels=(16, 32, 64), in_index=(1, 2, 3),
         input_transform='multiple_select', channels=8, num_codes=4,
         num_classes=5, norm_cfg=NORM),
    dict(type='SETRUPHead', in_channels=64, in_index=3, channels=8,
         num_convs=2, num_classes=5, norm_cfg=NORM),
    dict(type='SETRMLAHead', in_channels=(8, 16, 32, 64),
         in_index=(0, 1, 2, 3), input_transform='multiple_select',
         channels=8, mla_channels=4, up_scale=2, num_classes=5,
         norm_cfg=NORM),
    dict(type='SegmenterMaskTransformerHead', in_channels=64,
         in_index=3, channels=16, embed_dims=16, num_layers=1,
         num_heads=2, num_classes=5),
])
def test_wave3_heads(cfg):
    head = build_head(cfg)
    variables = head.init({'params': RNG}, _pyramid())
    logits, feats = head.apply(variables, _pyramid())
    assert logits.shape[-1] == 5 and logits.shape[0] == 1


@pytest.mark.parametrize('cfg,n_outs', [
    (dict(type='FastSCNN', downsample_dw_channels=(4, 8),
          global_in_channels=8, global_block_channels=(8, 8, 8),
          global_out_channels=8, fusion_out_channels=8,
          norm_cfg=NORM), 3),
    (dict(type='CGNet', num_channels=(4, 8, 16), num_blocks=(1, 2),
          norm_cfg=NORM), 3),
    (dict(type='ERFNet', enc_downsample_channels=(4, 8, 16),
          enc_stage_non_bottlenecks=(1, 2), norm_cfg=NORM), 3),
    (dict(type='STDCNet', channels=(4, 8, 16, 32, 64),
          norm_cfg=NORM), 3),
    (dict(type='BiSeNetV1',
          backbone_cfg=dict(type='ResNet', depth=18, base_channels=4,
                            stem_channels=4, norm_cfg=NORM),
          context_channels=(8, 16, 32), spatial_channels=(4, 4, 4, 8),
          out_channels=16, norm_cfg=NORM), 3),
    (dict(type='BiSeNetV2', detail_channels=(4, 4, 8),
          semantic_channels=(2, 4, 8, 8), bga_channels=8,
          norm_cfg=NORM), 5),
])
def test_fast_cnn_backbones(cfg, n_outs):
    bb = build_backbone(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = bb.init({'params': RNG}, x)
    outs = bb.apply(variables, x)
    assert len(outs) == n_outs
    for o in outs:
        assert o.ndim == 4 and np.all(np.isfinite(np.asarray(o)))


def test_icnet_backbone():
    bb = build_backbone(dict(
        type='ICNet',
        backbone_cfg=dict(type='ResNetV1c', depth=18, base_channels=4,
                          stem_channels=4, dilations=(1, 1, 2, 4),
                          strides=(1, 2, 1, 1), norm_cfg=NORM,
                          contract_dilation=True),
        out_channels=(4, 8, 8), norm_cfg=NORM))
    x = jnp.zeros((1, 64, 64, 3))
    variables = bb.init({'params': RNG}, x)
    outs = bb.apply(variables, x)
    assert len(outs) == 3
