"""Smoke tests for the second wave of backbones/heads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfst_tpu.models import build_backbone, build_head

RNG = jax.random.PRNGKey(0)
NORM = dict(type='BN')


def run_module(mod, x, **kw):
    variables = mod.init({'params': RNG}, x, **kw)
    return mod.apply(variables, x, **kw)


def _pyramid(chs=(8, 16, 32, 64), sizes=(16, 8, 4, 2)):
    return tuple(
        jnp.asarray(np.random.RandomState(i).randn(1, s, s, c),
                    jnp.float32) for i, (c, s) in enumerate(
                        zip(chs, sizes)))


def test_hrnet_tiny():
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                    num_blocks=(1,), num_channels=(4,)),
        stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                    num_blocks=(1, 1), num_channels=(4, 8)),
        stage3=dict(num_modules=1, num_branches=3, block='BASIC',
                    num_blocks=(1, 1, 1), num_channels=(4, 8, 16)),
        stage4=dict(num_modules=1, num_branches=4, block='BASIC',
                    num_blocks=(1, 1, 1, 1),
                    num_channels=(4, 8, 16, 32)))
    bb = build_backbone(dict(type='HRNet', extra=extra, norm_cfg=NORM))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [4, 8, 16, 32]


def test_vit_backbone():
    bb = build_backbone(dict(type='VisionTransformer', img_size=32,
                             patch_size=8, embed_dims=16, num_layers=2,
                             num_heads=2, out_indices=(0, 1)))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert len(outs) == 2
    assert outs[0].shape == (1, 8, 8, 16)  # pos-embed resized 4->8


@pytest.mark.parametrize('head_type', ['OCRHead', 'DNLHead', 'APCHead',
                                       'DMHead', 'EMAHead'])
def test_context_heads(head_type):
    head = build_head(dict(type=head_type, in_channels=64, in_index=3,
                           channels=8, num_classes=5, norm_cfg=NORM,
                           **({'ema_channels': 8, 'num_bases': 4}
                              if head_type == 'EMAHead' else {})))
    variables = head.init({'params': RNG}, _pyramid())
    logits, feats = head.apply(variables, _pyramid())
    assert logits.shape == (1, 2, 2, 5)


def test_ann_head():
    head = build_head(dict(type='ANNHead', in_channels=(32, 64),
                           in_index=(2, 3), channels=8, num_classes=5,
                           input_transform='multiple_select',
                           norm_cfg=NORM))
    variables = head.init({'params': RNG}, _pyramid())
    logits, _ = head.apply(variables, _pyramid())
    assert logits.shape == (1, 2, 2, 5)


def test_convnext_tiny():
    bb = build_backbone(dict(type='ConvNeXt', arch='tiny',
                             out_indices=(0, 1, 2, 3),
                             drop_path_rate=0.1))
    outs = run_module(bb, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [96, 192, 384, 768]


def test_resnet_with_cp_remat_equivalence():
    """with_cp=True (activation checkpointing via nn.remat, the
    reference's torch.utils.checkpoint at ``resnet.py:89``) must keep
    the param tree and compute the same outputs/grads, modulo float
    reassociation from the backward-pass recompute."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pfst_tpu.models import build_backbone

    def build(with_cp):
        return build_backbone(dict(
            type='ResNetV1c', depth=18, num_stages=4, base_channels=8,
            stem_channels=8, out_indices=(0, 1, 2, 3),
            dilations=(1, 1, 2, 4), strides=(1, 2, 1, 1),
            norm_cfg=dict(type='BN', requires_grad=True),
            contract_dilation=True, with_cp=with_cp))

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    results = {}
    for cp in (False, True):
        bb = build(cp)
        v = bb.init({'params': jax.random.PRNGKey(0)}, x, train=False)

        def loss(params):
            o, _ = bb.apply(
                {'params': params, 'batch_stats': v['batch_stats']},
                x, True, mutable=['batch_stats'])
            return sum(jnp.sum(t ** 2) for t in o)

        val, grads = jax.jit(jax.value_and_grad(loss))(v['params'])
        results[cp] = (jax.tree.structure(v['params']), float(val),
                       grads)
    assert results[False][0] == results[True][0]
    np.testing.assert_allclose(results[False][1], results[True][1],
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results[False][2]),
                    jax.tree.leaves(results[True][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


import pytest


@pytest.mark.parametrize('cfg_fn', [
    lambda cp: dict(type='VisionTransformer', img_size=32, patch_size=8,
                    embed_dims=16, num_layers=2, num_heads=2,
                    out_indices=(1,), with_cp=cp),
    lambda cp: dict(type='SwinTransformer', pretrain_img_size=32,
                    embed_dims=8, depths=(1, 1), num_heads=(1, 2),
                    window_size=4, out_indices=(0, 1), patch_size=4,
                    strides=(4, 2), with_cp=cp),
    lambda cp: dict(type='BEiT', img_size=32, patch_size=8,
                    embed_dims=16, num_layers=2, num_heads=2,
                    out_indices=(1,), with_cp=cp),
    lambda cp: dict(type='MixVisionTransformer', embed_dims=8,
                    num_stages=2, num_layers=(1, 1), num_heads=(1, 2),
                    patch_sizes=(7, 3), strides=(4, 2),
                    sr_ratios=(4, 2), out_indices=(0, 1), with_cp=cp),
    lambda cp: dict(type='PCPVT', embed_dims=(8, 16),
                    num_heads=(1, 2), depths=(1, 1), sr_ratios=(4, 2),
                    patch_sizes=(4, 2), out_indices=(0, 1),
                    mlp_ratios=(4, 4), windows=(0, 0), with_cp=cp),
], ids=['vit', 'swin', 'beit', 'mit', 'twins'])
def test_transformer_with_cp_remat_equivalence(cfg_fn):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pfst_tpu.models import build_backbone

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    results = {}
    for cp in (False, True):
        bb = build_backbone(cfg_fn(cp))
        v = bb.init({'params': jax.random.PRNGKey(0)}, x, train=False)

        def loss(params):
            o = bb.apply({'params': params}, x, train=True,
                         rngs={'dropout': jax.random.PRNGKey(1)})
            return sum(jnp.sum(t ** 2) for t in o)

        val, grads = jax.jit(jax.value_and_grad(loss))(v['params'])
        results[cp] = (jax.tree.structure(v['params']), float(val),
                       grads)
    assert results[False][0] == results[True][0]
    np.testing.assert_allclose(results[False][1], results[True][1],
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(results[False][2]),
                    jax.tree.leaves(results[True][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


def test_s2d_stem_equivalence():
    """The space-to-depth stem rewrite (``resnet.py _S2DConvInner``)
    is bit-compatible: same param tree, same outputs (up to float
    summation order) as the plain 3x3/s2 deep-stem conv."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from pfst_tpu.models.builder import build_backbone

    cfg = dict(type='ResNetV1c', depth=18, num_stages=2,
               base_channels=8, stem_channels=8, out_indices=(0, 1),
               strides=(1, 2), dilations=(1, 1),
               norm_cfg=dict(type='BN', requires_grad=True))
    plain = build_backbone(dict(cfg))
    s2d = build_backbone(dict(cfg, s2d_stem=True))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    variables = plain.init({'params': jax.random.PRNGKey(0)}, x)
    # identical param tree: the s2d model must accept the plain
    # model's variables verbatim
    out_a = plain.apply(variables, x)
    out_b = s2d.apply(variables, x)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
    # and the reverse init produces the same tree structure
    v2 = s2d.init({'params': jax.random.PRNGKey(0)}, x)
    ka = jax.tree_util.tree_structure(variables)
    kb = jax.tree_util.tree_structure(v2)
    assert ka == kb
