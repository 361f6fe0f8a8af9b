"""Model-zoo smoke tests: every backbone/head/neck builds and produces
the expected shapes (the reference's per-component test taxonomy,
``tests/test_models/``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfst_tpu.models import (build_backbone, build_head, build_neck,
                             build_segmentor)

RNG = jax.random.PRNGKey(0)
NORM = dict(type='BN')


def run_module(mod, x, **kw):
    variables = mod.init({'params': RNG}, x, **kw)
    return mod.apply(variables, x, **kw)


# --------------------------- backbones --------------------------------
def test_resnet_v1c_os8_shapes():
    bb = build_backbone(dict(
        type='ResNetV1c', depth=50, base_channels=8, stem_channels=8,
        dilations=(1, 1, 2, 4), strides=(1, 2, 1, 1), norm_cfg=NORM,
        contract_dilation=True))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[1] for o in outs] == [16, 8, 8, 8]  # OS 4,8,8,8
    assert [o.shape[-1] for o in outs] == [32, 64, 128, 256]


def test_resnet18_basicblock():
    bb = build_backbone(dict(type='ResNet', depth=18, base_channels=8,
                             stem_channels=8, norm_cfg=NORM))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_resnext_grouped():
    bb = build_backbone(dict(type='ResNeXt', depth=50, base_channels=8,
                             stem_channels=8, groups=4, base_width=4,
                             norm_cfg=NORM))
    outs = run_module(bb, jnp.zeros((1, 32, 32, 3)))
    assert outs[-1].shape == (1, 1, 1, 256)


def test_mobilenet_v2():
    bb = build_backbone(dict(type='MobileNetV2', widen_factor=0.5,
                             norm_cfg=NORM))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert len(outs) == 4
    assert outs[0].shape[1] == 16  # stride 4 at out_index 1


def test_mobilenet_v3():
    bb = build_backbone(dict(type='MobileNetV3', arch='small',
                             out_indices=(0, 1, 12), norm_cfg=NORM))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert len(outs) == 3


def test_mit_segformer_backbone():
    bb = build_backbone(dict(type='MixVisionTransformer', embed_dims=8,
                             num_layers=(1, 1, 1, 1),
                             num_heads=(1, 2, 4, 8)))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [8, 16, 32, 64]


def test_swin_backbone():
    bb = build_backbone(dict(type='SwinTransformer', embed_dims=8,
                             depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                             window_size=4))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [8, 16, 32, 64]


def test_unet_backbone():
    bb = build_backbone(dict(type='UNet', base_channels=4, norm_cfg=NORM))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert outs[-1].shape == (1, 64, 64, 4)  # full-res decoder output


# ----------------------------- heads ----------------------------------
def _pyramid(chs=(8, 16, 32, 64), sizes=(16, 8, 4, 2)):
    return tuple(
        jnp.asarray(np.random.RandomState(i).randn(1, s, s, c),
                    jnp.float32) for i, (c, s) in enumerate(
                        zip(chs, sizes)))


@pytest.mark.parametrize('cfg,feat_like', [
    (dict(type='PSPHead', in_channels=64, in_index=3, channels=8,
          num_classes=5, norm_cfg=NORM), 2),
    (dict(type='UPerHead', in_channels=(8, 16, 32, 64),
          in_index=(0, 1, 2, 3), channels=8, num_classes=5,
          input_transform='multiple_select', norm_cfg=NORM), 16),
    (dict(type='SegformerHead', in_channels=(8, 16, 32, 64),
          in_index=(0, 1, 2, 3), channels=8, num_classes=5,
          input_transform='multiple_select', norm_cfg=NORM), 16),
    (dict(type='DAHead', in_channels=64, in_index=3, channels=8,
          num_classes=5, norm_cfg=NORM), 2),
    (dict(type='NLHead', in_channels=64, in_index=3, channels=8,
          num_classes=5, norm_cfg=NORM), 2),
    (dict(type='GCHead', in_channels=64, in_index=3, channels=8,
          num_classes=5, norm_cfg=NORM), 2),
])
def test_heads_shapes(cfg, feat_like):
    head = build_head(cfg)
    variables = head.init({'params': RNG}, _pyramid())
    out = head.apply(variables, _pyramid())
    logits = out[0]  # DAHead additionally returns pam/cam branch logits
    assert logits.shape[0] == 1 and logits.shape[-1] == 5
    assert logits.shape[1] == feat_like


def test_lraspp_head():
    feats = (jnp.zeros((1, 16, 16, 4)), jnp.zeros((1, 8, 8, 8)),
             jnp.zeros((1, 2, 2, 64)))
    head = build_head(dict(type='LRASPPHead', in_channels=(4, 8, 64),
                           in_index=(0, 1, 2), channels=8,
                           branch_channels=(2, 4), num_classes=5,
                           input_transform='multiple_select',
                           norm_cfg=NORM))
    variables = head.init({'params': RNG}, feats)
    logits, _ = head.apply(variables, feats)
    assert logits.shape == (1, 16, 16, 5)


# ----------------------------- necks ----------------------------------
def test_fpn():
    neck = build_neck(dict(type='FPN', in_channels=(8, 16, 32, 64),
                           out_channels=8, num_outs=4))
    outs = run_module(neck, _pyramid())
    assert all(o.shape[-1] == 8 for o in outs)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]


def test_jpu():
    neck = build_neck(dict(type='JPU', in_channels=(16, 32, 64),
                           mid_channels=8, norm_cfg=NORM))
    ins = _pyramid((16, 32, 64), (8, 4, 2))
    outs = run_module(neck, ins)
    assert outs[-1].shape == (1, 8, 8, 32)


def test_ic_neck():
    neck = build_neck(dict(type='ICNeck', in_channels=(4, 8, 16),
                           out_channels=8, norm_cfg=NORM))
    ins = _pyramid((4, 8, 16), (16, 8, 4))
    outs = run_module(neck, ins)
    assert outs[0].shape == (1, 16, 16, 8)


def test_mla_neck():
    neck = build_neck(dict(type='MLANeck', in_channels=(8,) * 4,
                           out_channels=4, norm_cfg=NORM))
    ins = _pyramid((8, 8, 8, 8), (8, 8, 8, 8))
    outs = run_module(neck, ins)
    assert all(o.shape == (1, 8, 8, 4) for o in outs)


# --------------------- slide inference semantics ----------------------
def test_slide_matches_whole_on_uniform_grid():
    """slide over an exactly-tiling grid with stride=crop equals
    per-tile whole inference stitched together."""
    from tests.conftest import tiny_model_cfg
    cfg = tiny_model_cfg()
    cfg['test_cfg'] = dict(mode='slide', crop_size=(32, 32),
                           stride=(32, 32))
    model = build_segmentor(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    variables = model.init({'params': RNG}, x, train=False)
    slide_logits, _ = model.apply(variables, x,
                                  method=model.slide_inference)
    # manual stitching
    manual = np.zeros(slide_logits.shape, np.float32)
    for y in (0, 32):
        for xx in (0, 32):
            crop = x[:, y:y + 32, xx:xx + 32]
            logits, _ = model.apply(variables, crop,
                                    method=model.encode_decode)
            manual[:, y:y + 32, xx:xx + 32] = np.asarray(logits)
    np.testing.assert_allclose(np.asarray(slide_logits), manual,
                               atol=1e-5)


def test_discriminator():
    from pfst_tpu.models import build_discriminator
    disc = build_discriminator(dict(type='FCDiscriminator',
                                    num_in_channels=6, ndf=8))
    out = run_module(disc, jnp.zeros((2, 64, 64, 6)))
    assert out.shape == (2, 1, 1, 1)


def test_sharded_slide_matches_single_device():
    """device-sharded scene inference equals the in-model slide path."""
    import jax
    from jax.sharding import Mesh
    from tests.conftest import tiny_model_cfg
    from pfst_tpu.parallel import sharded_slide_inference
    cfg = tiny_model_cfg()
    cfg['test_cfg'] = dict(mode='slide', crop_size=(32, 32),
                           stride=(16, 16))
    model = build_segmentor(cfg)
    scene = jnp.asarray(np.random.RandomState(0).randn(64, 64, 3),
                        jnp.float32)
    variables = model.init({'params': RNG}, scene[None], train=False)
    ref_logits, _ = model.apply(variables, scene[None],
                                method=model.slide_inference)
    mesh = Mesh(np.asarray(jax.devices()), ('data',))
    sharded = sharded_slide_inference(model, variables, scene,
                                      crop=(32, 32), stride=(16, 16),
                                      mesh=mesh)
    np.testing.assert_allclose(np.asarray(ref_logits[0]), sharded,
                               atol=2e-4, rtol=1e-4)
