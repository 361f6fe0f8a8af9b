import os

# 8 virtual CPU devices so multi-chip sharding tests run anywhere.
# Force-override: the session environment may pre-set JAX_PLATFORMS to
# a TPU platform, AND pytest plugin auto-loading imports jax before
# this conftest — so set both the env var and the live jax config
# (effective as long as no backend has been initialized yet).
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', (
    'unit tests must run on the virtual CPU mesh, got '
    f'{jax.default_backend()}')
assert jax.local_device_count() == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def tiny_model_cfg(num_classes=6, depth=18):
    """Small EncoderDecoder cfg for fast CPU tests."""
    norm_cfg = dict(type='BN', requires_grad=True)
    return dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNetV1c', depth=depth, num_stages=4,
                      base_channels=8, stem_channels=8,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), norm_cfg=norm_cfg,
                      contract_dilation=True),
        decode_head=dict(type='DepthwiseSeparableASPPHead',
                         in_channels=64, in_index=3, channels=16,
                         dilations=(1, 6, 12, 18), c1_in_channels=8,
                         c1_channels=4, dropout_ratio=0.1,
                         num_classes=num_classes, norm_cfg=norm_cfg,
                         align_corners=False,
                         loss_decode=dict(type='CrossEntropyLoss',
                                          use_sigmoid=False,
                                          loss_weight=1.0)),
        auxiliary_head=dict(type='FCNHead', in_channels=32, in_index=2,
                            channels=8, num_convs=1, concat_input=False,
                            dropout_ratio=0.1, num_classes=num_classes,
                            norm_cfg=norm_cfg, align_corners=False,
                            loss_decode=dict(type='CrossEntropyLoss',
                                             use_sigmoid=False,
                                             loss_weight=0.4)),
        train_cfg=dict(),
        test_cfg=dict(mode='whole'))
