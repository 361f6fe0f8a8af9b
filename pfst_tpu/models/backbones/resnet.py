"""ResNet / ResNetV1c / ResNetV1d backbones (flax.linen, NHWC).

TPU-native re-implementation of the reference backbone
(``rsiseg/models/backbones/resnet.py``), covering the pieces the PFST
configs exercise plus the general knobs of the mmseg family:

* depths 18/34/50/101/152 (BasicBlock / Bottleneck),
* ``pytorch``-style blocks (stride on the 3x3 conv:
  reference ``resnet.py`` Bottleneck),
* deep 3x3x3 stem for V1c/V1d (reference ``resnet.py:593-638``),
* per-stage ``strides``/``dilations`` with ``contract_dilation``
  (first block of a dilated stage uses ``dilation//2``:
  ``models/utils/res_layer.py`` first_dilation) and ``multi_grid``,
* ``out_indices``, ``norm_eval``, ``frozen_stages`` (BN-eval handled
  here; gradient freezing is applied by the optimizer mask).

Output-stride-8 for DeepLabV3+ comes from
``strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4)`` as in
``configs/_base_/models/deeplabv3plus_r50-d8.py:6-16``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from ..utils.layers import ConvModule, Norm


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    avg_down: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvModule(
            self.planes, 3, stride=self.stride, padding=self.dilation,
            dilation=self.dilation, norm_cfg=self.norm_cfg,
            dtype=self.dtype, name='conv1')(x, train=train)
        out = ConvModule(
            self.planes, 3, padding=1, norm_cfg=self.norm_cfg,
            act_cfg={'type': 'none'}, dtype=self.dtype,
            name='conv2')(out, train=train)
        if self.with_downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, self.avg_down,
                                   self.norm_cfg, self.dtype, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    avg_down: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        # pytorch-style: stride lives on the 3x3 conv
        out = ConvModule(
            self.planes, 1, norm_cfg=self.norm_cfg, dtype=self.dtype,
            name='conv1')(x, train=train)
        out = ConvModule(
            self.planes, 3, stride=self.stride, padding=self.dilation,
            dilation=self.dilation, norm_cfg=self.norm_cfg,
            dtype=self.dtype, name='conv2')(out, train=train)
        out = ConvModule(
            self.planes * self.expansion, 1, norm_cfg=self.norm_cfg,
            act_cfg={'type': 'none'}, dtype=self.dtype,
            name='conv3')(out, train=train)
        if self.with_downsample:
            identity = _downsample(x, self.planes * self.expansion,
                                   self.stride, self.avg_down,
                                   self.norm_cfg, self.dtype, train)
        return nn.relu(out + identity)


class _S2DConvInner(nn.Module):
    """The stem's 3x3/s2 conv computed as a 2x2/s1 conv over
    space-to-depth input (MLPerf ResNet trick).

    Declares the ordinary (3, 3, cin, out) kernel under the SAME param
    path as ``ConvModule``'s conv — checkpoints and converters are
    unaffected.  In-trace the kernel is zero-padded to 4x4 and
    re-blocked so the contraction runs over 4*cin input channels (12
    for RGB), which tiles the MXU far better than 3."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            'kernel',
            nn.initializers.variance_scaling(2.0, 'fan_out',
                                             'truncated_normal'),
            (3, 3, cin, self.features), jnp.float32)
        b, h, w, _ = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h2, w2 = (h + 2) // 2, (w + 2) // 2
        s = xp.reshape(b, h2, 2, w2, 2, cin).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, h2, w2, 4 * cin)
        k4 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k = k4.reshape(2, 2, 2, 2, cin, self.features).transpose(
            0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * cin, self.features)
        return jax.lax.conv_general_dilated(
            s.astype(self.dtype), k.astype(self.dtype), (1, 1),
            'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class _S2DStemConv(nn.Module):
    """ConvModule twin (conv+norm+relu) using the s2d stem conv."""
    features: int
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _S2DConvInner(self.features, dtype=self.dtype,
                          name='conv')(x)
        x = Norm(self.features, self.norm_cfg, dtype=self.dtype,
                 name='norm')(x, train=train)
        return nn.relu(x)


class _Downsample(nn.Module):
    features: int
    stride: int
    avg_down: bool
    norm_cfg: Optional[dict]
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride = self.stride
        if self.avg_down and stride != 1:
            x = nn.avg_pool(x, (stride, stride), strides=(stride, stride),
                            padding='VALID')
            stride = 1
        return ConvModule(
            self.features, 1, stride=stride, norm_cfg=self.norm_cfg,
            act_cfg={'type': 'none'}, dtype=self.dtype,
            name='conv')(x, train=train)


def _downsample(x, features, stride, avg_down, norm_cfg, dtype, train):
    return _Downsample(features, stride, avg_down, norm_cfg, dtype,
                       name='downsample')(x, train=train)


@BACKBONES.register_module()
class ResNet(nn.Module):
    """ResNet backbone returning the feature maps at ``out_indices``."""
    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    style: str = 'pytorch'
    deep_stem: bool = False
    avg_down: bool = False
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    norm_eval: bool = False
    contract_dilation: bool = False
    multi_grid: Optional[Sequence[int]] = None
    zero_init_residual: bool = True
    with_cp: bool = False
    # opt-in space-to-depth stem rewrite (deep_stem only): identical
    # math + identical param tree, denser MXU tiling on the 3-channel
    # first conv (see _S2DConvInner)
    s2d_stem: bool = False
    pretrained: Optional[str] = None
    init_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    arch_settings = {
        18: (BasicBlock, (2, 2, 2, 2)),
        34: (BasicBlock, (3, 4, 6, 3)),
        50: (Bottleneck, (3, 4, 6, 3)),
        101: (Bottleneck, (3, 4, 23, 3)),
        152: (Bottleneck, (3, 8, 36, 3)),
    }

    def _stage_train(self, stage_idx: int, train: bool) -> bool:
        """BN mode for a stage: eval when frozen or norm_eval."""
        if self.norm_eval:
            return False
        if self.frozen_stages >= stage_idx + 1:
            return False
        return train

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depth not in self.arch_settings:
            raise KeyError(f'invalid depth {self.depth} for resnet')
        block_cls, stage_blocks = self.arch_settings[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        if self.with_cp:
            # activation checkpointing (the reference's ``with_cp``,
            # torch.utils.checkpoint at ``resnet.py:89``): rematerialize
            # each block on the backward pass — TPU-native remat trades
            # FLOPs for HBM so larger batches/crops fit per chip.
            # static_argnums: (self, x, train) — ``train`` is a python
            # bool branching the BN mode.
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        stem_train = train and not self.norm_eval and self.frozen_stages < 0
        if self.deep_stem:
            half = self.stem_channels // 2
            if self.s2d_stem:
                # space-to-depth rewrite of the 3x3/s2 stem conv
                # (MLPerf-style): the 3-channel input pads to the MXU
                # lane width very wastefully; rearranging 2x2 pixel
                # blocks into 12 channels runs the SAME weights (the
                # kernel is zero-padded to 4x4 and re-blocked in-trace,
                # so checkpoints stay compatible) as a denser
                # 2x2/s1 conv at half resolution. Bit-equivalent up to
                # float summation order; tests/test_models_extra.py
                x = _S2DStemConv(half, norm_cfg=self.norm_cfg,
                                 dtype=self.dtype,
                                 name='stem_conv1')(x, train=stem_train)
            else:
                x = ConvModule(half, 3, stride=2, padding=1,
                               norm_cfg=self.norm_cfg, dtype=self.dtype,
                               name='stem_conv1')(x, train=stem_train)
            x = ConvModule(half, 3, stride=1, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='stem_conv2')(x, train=stem_train)
            x = ConvModule(self.stem_channels, 3, stride=1, padding=1,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='stem_conv3')(x, train=stem_train)
        else:
            x = ConvModule(self.stem_channels, 7, stride=2, padding=3,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name='conv1')(x, train=stem_train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**i
            stride = self.strides[i]
            dilation = self.dilations[i]
            stage_train = self._stage_train(i, train)
            for b in range(num_blocks):
                if self.multi_grid is not None and i == len(
                        stage_blocks) - 1:
                    blk_dilation = self.multi_grid[b]
                elif (b == 0 and dilation > 1 and self.contract_dilation):
                    blk_dilation = dilation // 2
                else:
                    blk_dilation = dilation
                blk_stride = stride if b == 0 else 1
                with_down = (b == 0 and (
                    blk_stride != 1
                    or x.shape[-1] != planes * block_cls.expansion))
                x = block_cls(
                    planes=planes,
                    stride=blk_stride,
                    dilation=blk_dilation,
                    with_downsample=with_down,
                    avg_down=self.avg_down,
                    norm_cfg=self.norm_cfg,
                    dtype=self.dtype,
                    name=f'layer{i + 1}_block{b}')(x, stage_train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


@BACKBONES.register_module()
class ResNetV1c(ResNet):
    """ResNet with deep 3x3x3 stem (reference ``resnet.py:689-701``)."""
    deep_stem: bool = True
    avg_down: bool = False


@BACKBONES.register_module()
class ResNetV1d(ResNet):
    """Deep stem + avg-pool downsampling (reference ``resnet.py:704``)."""
    deep_stem: bool = True
    avg_down: bool = True
