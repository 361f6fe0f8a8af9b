"""Shared conv/norm building blocks (flax.linen, NHWC).

TPU-native equivalents of mmcv's ``ConvModule`` /
``DepthwiseSeparableConvModule`` used across the reference model zoo.
Norm selection follows the reference's ``norm_cfg`` dicts: ``BN`` is
per-replica batch norm (torch momentum 0.1 -> flax momentum 0.9,
eps 1e-5); ``SyncBN`` is cross-replica BN via ``axis_name`` so batch
statistics ride the mesh's data axis; ``GN``/``LN`` are stateless.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Mesh axis along which SyncBN statistics are reduced. Set by the
# training loop when running under shard_map/pmap with a named axis.
SYNC_BN_AXIS = 'data'


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Norm(nn.Module):
    """Norm layer dispatching on a ``norm_cfg``-style dict."""
    features: int
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = dict(self.norm_cfg or {'type': 'BN'})
        kind = cfg.pop('type', 'BN')
        cfg.pop('requires_grad', None)
        if kind in ('BN', 'BN2d', 'SyncBN'):
            momentum = 1.0 - cfg.pop('momentum', 0.1)
            eps = cfg.pop('eps', 1e-5)
            axis_name = SYNC_BN_AXIS if kind == 'SyncBN' else None
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=momentum,
                epsilon=eps,
                axis_name=axis_name,
                dtype=self.dtype,
                name='bn')(x)
        if kind == 'GN':
            return nn.GroupNorm(
                num_groups=cfg.pop('num_groups', 32),
                epsilon=cfg.pop('eps', 1e-5),
                dtype=self.dtype,
                name='gn')(x)
        if kind == 'LN':
            return nn.LayerNorm(
                epsilon=cfg.pop('eps', 1e-6), dtype=self.dtype,
                name='ln')(x)
        if kind == 'IN':
            # InstanceNorm = GroupNorm with one channel per group
            # (was silently a pass-through before)
            return nn.GroupNorm(
                num_groups=None, group_size=1,
                epsilon=cfg.pop('eps', 1e-5), dtype=self.dtype,
                name='in')(x)
        if kind in ('none', None):
            return x
        raise ValueError(f'unsupported norm type {kind}')


def build_act(act_cfg: Optional[dict]) -> Optional[Callable]:
    if act_cfg is None:
        return None
    kind = act_cfg.get('type', 'ReLU')
    table = {
        'ReLU': nn.relu,
        'ReLU6': lambda x: jnp.minimum(nn.relu(x), 6.0),
        'GELU': nn.gelu,
        'SiLU': nn.silu,
        'Swish': nn.silu,
        'Sigmoid': nn.sigmoid,
        'Tanh': jnp.tanh,
        'LeakyReLU': lambda x: nn.leaky_relu(
            x, negative_slope=act_cfg.get('negative_slope', 0.01)),
        'HSwish': nn.hard_swish,
        'HSigmoid': nn.hard_sigmoid,
    }
    if kind not in table:
        raise ValueError(f'unsupported act type {kind}')
    return table[kind]


class ConvModule(nn.Module):
    """conv (+ norm) (+ act), NHWC. mmcv ``ConvModule`` equivalent."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int], str] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    bias: Union[bool, str] = 'auto'
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    order: Tuple[str, ...] = ('conv', 'norm', 'act')
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        with_norm = self.norm_cfg is not None
        use_bias = (not with_norm) if self.bias == 'auto' else bool(self.bias)
        if isinstance(self.padding, str):
            padding = self.padding
        else:
            p = _pair(self.padding)
            padding = ((p[0], p[0]), (p[1], p[1]))
        conv = nn.Conv(
            features=self.out_channels,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.stride),
            padding=padding,
            kernel_dilation=_pair(self.dilation),
            feature_group_count=self.groups,
            use_bias=use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                2.0, 'fan_out', 'truncated_normal'),
            name='conv')
        # act_cfg semantics (mmcv): None -> default ReLU; explicit dict
        # overrides; dict(type='none') disables activation.
        if hasattr(self.act_cfg, 'get') and \
                self.act_cfg.get('type') in ('none', None):
            act = None
        else:
            act = build_act(self.act_cfg if self.act_cfg is not None
                            else {'type': 'ReLU'})

        for layer in self.order:
            if layer == 'conv':
                x = conv(x)
            elif layer == 'norm' and with_norm:
                x = Norm(self.out_channels, self.norm_cfg,
                         dtype=self.dtype, name='norm')(x, train=train)
            elif layer == 'act' and act is not None:
                x = act(x)
        return x


class DepthwiseSeparableConvModule(nn.Module):
    """depthwise 3x3 (+norm+act) then pointwise 1x1 (+norm+act)."""
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        x = ConvModule(
            out_channels=in_channels,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=in_channels,
            norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg,
            dtype=self.dtype,
            name='depthwise_conv')(x, train=train)
        x = ConvModule(
            out_channels=self.out_channels,
            kernel_size=1,
            norm_cfg=self.norm_cfg,
            act_cfg=self.act_cfg,
            dtype=self.dtype,
            name='pointwise_conv')(x, train=train)
        return x
