"""Int8 post-training quantization for the inference path.

TPU-native counterpart (and extension) of the reference's deploy-time
precision lowering — its TensorRT path exposes fp16
(``tools/onnx2tensorrt.py:112-128,213``); here the MXU's s8×s8→s32
mode is targeted directly, which on v5e doubles the matmul peak over
bf16 (394 vs 197 TOPS).

Design: a flax *method interceptor* — no model or checkpoint changes.
Inside ``int8_inference()`` every ``nn.Conv.__call__`` is re-emitted
as

    q(x) ⊛ q(W)  in int8 → int32,  then  × (a_s · w_s)  in fp32

with a per-tensor activation scale (dynamic ``max|x|/127`` by default,
or static scales from :func:`calibrate_act_scales`) and per-output-
channel weight scales.  Weight round/clip is traced into the program —
cheap elementwise work next to the conv itself, and the params tree
stays fp32 so one set of weights serves both precisions.

Accuracy: per-channel weights + per-tensor activations is the
standard PTQ recipe; ``tests/test_quant.py`` bounds the logits error
and the synthetic-val mIoU delta.  The logits conv (``conv_seg``) is
skipped by default — quantizing the classifier costs the most mIoU
and the least time.
"""
from __future__ import annotations

import contextlib
import fnmatch
from typing import Dict, Iterable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_SKIP = ('*conv_seg*',)


def _pair(v):
    if v is None:
        return (1, 1)
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _conv_path(mod) -> str:
    return '/'.join(str(p) for p in mod.path)


def _should_skip(path: str, skip: Iterable[str]) -> bool:
    return any(fnmatch.fnmatch(path, pat) for pat in skip)


def _emit_conv(mod: nn.Conv, x, w, preferred=None):
    """mod's convolution geometry with explicit operands."""
    padding = mod.padding if isinstance(mod.padding, str) \
        else tuple((p, p) if isinstance(p, int) else tuple(p)
                   for p in mod.padding)
    return lax.conv_general_dilated(
        x, w,
        window_strides=_pair(mod.strides),
        padding=padding,
        rhs_dilation=_pair(mod.kernel_dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=mod.feature_group_count,
        preferred_element_type=preferred)


def _quantize_conv(mod: nn.Conv, x, a_scale):
    """Emit mod's convolution as s8×s8→s32 with fp32 rescale."""
    kernel = mod.variables['params']['kernel']
    a_s = a_scale.astype(jnp.float32) / 127.0
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s),
                  -127, 127).astype(jnp.int8)
    w_s = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
    w_s = jnp.maximum(w_s, 1e-12)
    qw = jnp.clip(jnp.round(kernel / w_s), -127, 127).astype(jnp.int8)
    y = _emit_conv(mod, qx, qw, preferred=jnp.int32)
    out = y.astype(jnp.float32) * (a_s * w_s)
    if mod.use_bias:
        out = out + mod.variables['params']['bias']
    return out.astype(x.dtype)


def _quantize_dense(mod: nn.Dense, x, a_scale):
    """Emit mod's matmul as s8×s8→s32 with fp32 rescale (per-out-
    channel weight scales; contraction over the last input axis, as
    ``nn.Dense`` does)."""
    kernel = mod.variables['params']['kernel']  # (in, out)
    a_s = a_scale.astype(jnp.float32) / 127.0
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s),
                  -127, 127).astype(jnp.int8)
    w_s = jnp.max(jnp.abs(kernel), axis=0) / 127.0
    w_s = jnp.maximum(w_s, 1e-12)
    qw = jnp.clip(jnp.round(kernel / w_s), -127, 127).astype(jnp.int8)
    y = lax.dot_general(
        qx, qw, (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (a_s * w_s)
    if mod.use_bias:
        out = out + mod.variables['params']['bias']
    return out.astype(x.dtype)


@contextlib.contextmanager
def int8_inference(act_scales: Optional[Dict[str, float]] = None,
                   skip: Iterable[str] = DEFAULT_SKIP):
    """Context manager: every flax ``nn.Conv`` / ``nn.Dense`` traced
    inside runs int8 (attention einsums and norms stay fp32/bf16).

    ``act_scales``: optional ``{module_path: max|x|}`` table from
    :func:`calibrate_act_scales`; layers without an entry (or with
    ``act_scales=None``) use a dynamic in-trace ``max|x|`` — one extra
    reduction per layer, no calibration needed.  ``skip``: fnmatch
    patterns of module paths left in fp32/bf16.

    Must be active while the program is TRACED (wrap the jit call, not
    just its construction).
    """
    scales = act_scales or {}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, (nn.Conv, nn.Dense))
                and context.method_name == '__call__'
                and 'params' in mod.variables  # unbound during init
                and not _should_skip(_conv_path(mod), skip)):
            x = args[0]
            a = scales.get(_conv_path(mod))
            a_scale = jnp.asarray(a, jnp.float32) if a is not None \
                else jnp.maximum(jnp.max(jnp.abs(x)),
                                 1e-12).astype(jnp.float32)
            if isinstance(mod, nn.Dense):
                return _quantize_dense(mod, x, a_scale)
            return _quantize_conv(mod, x, a_scale)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


def _fake_quant(v, scale):
    """Round ``v`` onto the symmetric s8 grid ``scale``-steps wide and
    return to float, with a straight-through-estimator gradient: the
    forward equals the int8 path's dequantized value exactly (by conv
    linearity), the backward passes through as identity so quantization
    noise trains the weights toward int8-robust minima."""
    v32 = v.astype(jnp.float32)
    q = jnp.clip(jnp.round(v32 / scale), -127, 127) * scale
    return (v32 + lax.stop_gradient(q - v32)).astype(v.dtype)


def _fake_quant_conv(mod: nn.Conv, x, a_scale):
    kernel = mod.variables['params']['kernel']
    a_s = a_scale.astype(jnp.float32) / 127.0
    fx = _fake_quant(x, a_s)
    w_s = jnp.maximum(
        jnp.max(jnp.abs(lax.stop_gradient(kernel)), axis=(0, 1, 2)),
        1e-12) / 127.0
    fw = _fake_quant(kernel, w_s)
    out = _emit_conv(mod, fx.astype(jnp.float32),
                     fw.astype(jnp.float32))
    if mod.use_bias:
        out = out + mod.variables['params']['bias']
    return out.astype(x.dtype)


def _fake_quant_dense(mod: nn.Dense, x, a_scale):
    kernel = mod.variables['params']['kernel']
    a_s = a_scale.astype(jnp.float32) / 127.0
    fx = _fake_quant(x, a_s)
    w_s = jnp.maximum(
        jnp.max(jnp.abs(lax.stop_gradient(kernel)), axis=0),
        1e-12) / 127.0
    fw = _fake_quant(kernel, w_s)
    y = lax.dot_general(fx.astype(jnp.float32),
                        fw.astype(jnp.float32),
                        (((fx.ndim - 1,), (0,)), ((), ())))
    if mod.use_bias:
        y = y + mod.variables['params']['bias']
    return y.astype(x.dtype)


@contextlib.contextmanager
def qat_training(act_scales: Optional[Dict[str, float]] = None,
                 skip: Iterable[str] = DEFAULT_SKIP):
    """Quantization-aware fine-tuning: every ``nn.Conv``/``nn.Dense``
    traced inside runs FAKE-quantized — forward numerics equal the
    :func:`int8_inference` program (same symmetric per-channel-weight /
    per-tensor-activation grid; conv linearity makes
    ``conv(q_x·a_s, q_w·w_s) == conv(q_x, q_w)·a_s·w_s`` exact) while
    gradients flow straight-through to the fp32 master weights.  A
    short fine-tune under this context recovers PTQ's accuracy drop;
    the resulting checkpoint deploys unchanged via
    ``tools/test.py --quant-int8``.  Config surface:
    ``qat = dict(enabled=True)`` in a training config (see
    ``apis/train.py``).  The reference has no quantization story at
    all (its closest analog is TensorRT fp16 export,
    ``tools/onnx2tensorrt.py:112-128``)."""
    scales = act_scales or {}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, (nn.Conv, nn.Dense))
                and context.method_name == '__call__'
                and 'params' in mod.variables
                and not _should_skip(_conv_path(mod), skip)):
            x = args[0]
            a = scales.get(_conv_path(mod))
            a_scale = jnp.asarray(a, jnp.float32) if a is not None \
                else lax.stop_gradient(
                    jnp.maximum(jnp.max(jnp.abs(x)),
                                1e-12)).astype(jnp.float32)
            if isinstance(mod, nn.Dense):
                return _fake_quant_dense(mod, x, a_scale)
            return _fake_quant_conv(mod, x, a_scale)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


def qat_context_from_cfg(cfg):
    """``cfg.qat`` -> context factory for the train loop: ``True`` or
    ``dict(enabled=True, skip=..., act_scales=...)`` enable fake-quant
    tracing; otherwise a nullcontext factory."""
    get = getattr(cfg, 'get', None)
    qat_cfg = get('qat') if callable(get) else None
    if not qat_cfg:
        return contextlib.nullcontext
    if qat_cfg is True:
        qat_cfg = {}
    kw = dict(act_scales=qat_cfg.get('act_scales'),
              skip=tuple(qat_cfg.get('skip', DEFAULT_SKIP)))
    if not qat_cfg.get('enabled', True):
        return contextlib.nullcontext
    return lambda: qat_training(**kw)


def calibrate_act_scales(apply_fn, batches,
                         skip: Iterable[str] = DEFAULT_SKIP,
                         percentile: float = 100.0
                         ) -> Dict[str, float]:
    """Run ``apply_fn(batch)`` eagerly over ``batches`` recording the
    running ``max|input|`` per conv/dense path.  The returned table
    feeds :func:`int8_inference` to drop the per-layer dynamic
    reduction.

    ``percentile`` < 100 clips each batch's statistic to that
    percentile of ``|x|`` (running max across batches) — the standard
    outlier-robust PTQ recipe: one huge activation otherwise wastes
    most of the 8-bit grid on a value that occurs once."""
    scales: Dict[str, float] = {}

    def _stat(x):
        ax = jnp.abs(x)
        if percentile >= 100.0:
            return float(jax.device_get(jnp.max(ax)))
        return float(jax.device_get(
            jnp.percentile(ax.astype(jnp.float32), percentile)))

    def recorder(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, (nn.Conv, nn.Dense))
                and context.method_name == '__call__'
                and not _should_skip(_conv_path(mod), skip)):
            p = _conv_path(mod)
            scales[p] = max(scales.get(p, 0.0), _stat(args[0]))
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(recorder):
        for b in batches:
            apply_fn(b)
    return scales
