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


def test_pointrend_dpt_knet_heads():
    from pfst_tpu.models import build_head
    # PointRend on a single fine level
    pr = build_head(dict(type='PointRendHead', in_channels=(8,),
                         in_index=(0,), input_transform='multiple_select',
                         channels=8, num_points=16, num_classes=5,
                         norm_cfg=NORM))
    feats = (_pyramid((8,), (16,))[0],)
    v = pr.init({'params': RNG}, feats)
    logits, _ = pr.apply(v, feats)
    assert logits.shape == (1, 16, 16, 5)
    # DPT over same-res token maps
    dpt = build_head(dict(type='DPTHead', in_channels=(8,) * 4,
                          in_index=(0, 1, 2, 3),
                          input_transform='multiple_select',
                          channels=8, post_process_channels=(4, 4, 8, 8),
                          num_classes=5, norm_cfg=NORM))
    sames = _pyramid((8, 8, 8, 8), (8, 8, 8, 8))
    v = dpt.init({'params': RNG}, sames)
    logits, _ = dpt.apply(v, sames)
    assert logits.shape[-1] == 5
    # KNet iterative head
    knet = build_head(dict(type='IterativeDecodeHead', in_channels=64,
                           in_index=3, channels=8, num_stages=2,
                           num_classes=5, norm_cfg=NORM))
    pyr = _pyramid()
    v = knet.init({'params': RNG}, pyr)
    logits, _ = knet.apply(v, pyr)
    assert logits.shape == (1, 2, 2, 5)


def test_twins_resnest_timm_backbones():
    from pfst_tpu.models import build_backbone
    import jax.numpy as jnp
    pcpvt = build_backbone(dict(type='PCPVT', embed_dims=(8, 16, 32, 64),
                                num_heads=(1, 2, 4, 8),
                                depths=(1, 1, 1, 1),
                                mlp_ratios=(2, 2, 2, 2)))
    x = jnp.zeros((1, 64, 64, 3))
    outs = pcpvt.apply(pcpvt.init({'params': RNG}, x), x)
    assert [o.shape[-1] for o in outs] == [8, 16, 32, 64]
    svt = build_backbone(dict(type='SVT', embed_dims=(8, 16, 32, 64),
                              num_heads=(1, 2, 4, 8),
                              depths=(1, 1, 2, 1),
                              mlp_ratios=(2, 2, 2, 2),
                              windows=(4, 4, 4, 4)))
    outs = svt.apply(svt.init({'params': RNG}, x), x)
    assert len(outs) == 4
    rs = build_backbone(dict(type='ResNeSt', depth=50, base_channels=8,
                             stem_channels=8, radix=2, norm_cfg=NORM))
    outs = rs.apply(rs.init({'params': RNG}, x), x)
    assert outs[-1].shape[-1] == 256
    tm = build_backbone(dict(type='TIMMBackbone', model_name='resnet50',
                             norm_cfg=NORM))
    v = tm.init({'params': RNG}, x)
    outs = tm.apply(v, x)
    assert outs[-1].shape[-1] == 2048


def test_enc_head_se_loss_trains_se_layer():
    """EncNet's SE branch: decode.loss_se appears in forward_train
    losses and its gradient reaches the se_layer weights."""
    from pfst_tpu.models import build_segmentor

    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNetV1c', depth=18, num_stages=4,
                      base_channels=4, stem_channels=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), norm_cfg=NORM,
                      contract_dilation=True),
        decode_head=dict(type='EncHead', in_channels=(8, 16, 32),
                         in_index=(1, 2, 3),
                         input_transform='multiple_select', channels=8,
                         num_codes=4, num_classes=5, norm_cfg=NORM,
                         use_se_loss=True,
                         loss_se_decode=dict(type='CrossEntropyLoss',
                                             use_sigmoid=True,
                                             loss_weight=0.2)),
        train_cfg=dict(), test_cfg=dict(mode='whole'))
    model = build_segmentor(cfg)
    img = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                      jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).randint(0, 5, (2, 32, 32)))
    variables = model.init({'params': RNG}, img, train=False)

    def loss_fn(params):
        (losses, _), _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']}, img, gt,
            train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(2)},
            method=model.forward_train)
        return losses['decode.loss_se'], losses

    (se_loss, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables['params'])
    assert np.isfinite(float(se_loss)) and float(se_loss) > 0
    g = grads['decode_head_mod']['se_layer']['kernel']
    assert float(jnp.abs(g).max()) > 0


def test_ema_head_bases_are_momentum_buffer():
    """EMANet bases live in batch_stats and move by momentum during
    train (not by gradient)."""
    head = build_head(dict(
        type='EMAHead', in_channels=64, in_index=3, channels=8,
        ema_channels=16, num_bases=4, num_stages=2, momentum=0.5,
        num_classes=5, norm_cfg=NORM))
    x = _pyramid()
    variables = head.init({'params': RNG}, x)
    assert 'bases' in variables['batch_stats']
    b0 = np.asarray(variables['batch_stats']['bases'])
    _, upd = head.apply(variables, x, train=True,
                        mutable=['batch_stats'],
                        rngs={'dropout': jax.random.PRNGKey(1)})
    b1 = np.asarray(upd['batch_stats']['bases'])
    assert not np.allclose(b0, b1)  # moved by the EM momentum update
    # eval does not move them
    _, upd2 = head.apply(variables, x, train=False,
                         mutable=['batch_stats'])
    np.testing.assert_allclose(
        np.asarray(upd2['batch_stats']['bases']), b0)


def test_cc_head_shares_attention_weights_across_recurrence():
    head = build_head(dict(
        type='CCHead', in_channels=64, in_index=3, channels=8,
        recurrence=2, num_classes=5, norm_cfg=NORM))
    variables = head.init({'params': RNG}, _pyramid())
    keys = set(variables['params'].keys())
    assert 'query_conv' in keys and 'q0' not in keys and \
        'q1' not in keys
