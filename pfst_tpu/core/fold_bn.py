"""Fold inference-mode BatchNorm into the preceding conv weights.

For a frozen-teacher / eval / export variable tree, every
``ConvModule``-shaped pair ``{conv: {kernel}, norm: {bn: ...}}`` is
rewritten so the conv kernel absorbs ``scale / sqrt(var + eps)`` and
the BN collapses to a pure bias add (scale=1, mean=0, var=1-eps) —
output-identical to the unfolded tree.

Measured effect on TPU (v5e-1, flagship DeepLabV3+ R50 at 512^2):
**none** — XLA already fuses inference BN into the conv epilogue
(67.0 ms/batch with BN vs 67.0 ms with norms stripped entirely).  The
utility exists for export paths (jax2tf/SavedModel graphs shrink) and
for numerical freezing, NOT as a throughput lever; PERF.md records the
measurement.  Reference counterpart: torch deploy-time BN fusion.
"""
from __future__ import annotations

import jax.numpy as jnp

BN_EPS_DEFAULT = 1e-5


def fold_batch_norms(variables: dict, eps: float = BN_EPS_DEFAULT
                     ) -> dict:
    """Return a new ``{'params', 'batch_stats'}`` tree with every
    conv+BN pair folded.  Tree structure is preserved (flax ``apply``
    sees identical shapes); only values change."""
    params = _copy(variables.get('params', {}))
    stats = _copy(variables.get('batch_stats', {}))
    _fold(params, stats, eps)
    out = dict(variables)
    out['params'] = params
    out['batch_stats'] = stats
    return out


def _copy(tree):
    if isinstance(tree, dict):
        return {k: _copy(v) for k, v in tree.items()}
    return tree


def _fold(params, stats, eps):
    if not isinstance(params, dict):
        return
    conv = params.get('conv')
    norm = params.get('norm')
    nstat = stats.get('norm') if isinstance(stats, dict) else None
    if (isinstance(conv, dict) and 'kernel' in conv and
            isinstance(norm, dict) and 'bn' in norm and
            isinstance(nstat, dict) and 'bn' in nstat):
        bn_p, bn_s = norm['bn'], nstat['bn']
        if 'scale' in bn_p and 'bias' in bn_p:
            scale, bias = bn_p['scale'], bn_p['bias']
            mean, var = bn_s['mean'], bn_s['var']
            inv = scale / jnp.sqrt(var + eps)
            conv['kernel'] = (conv['kernel'] *
                              inv.astype(conv['kernel'].dtype))
            folded = (conv['bias'] - mean) * inv if 'bias' in conv \
                else -mean * inv
            if 'bias' in conv:
                conv['bias'] = jnp.zeros_like(conv['bias'])
            # BN collapses to a pure bias add:
            # (x - 0) / sqrt((1-eps) + eps) * 1 + folded
            bn_p['scale'] = jnp.ones_like(scale)
            bn_p['bias'] = (folded + bias).astype(bias.dtype)
            bn_s['mean'] = jnp.zeros_like(mean)
            bn_s['var'] = jnp.full_like(var, 1.0 - eps)
    for k, v in params.items():
        if isinstance(v, dict):
            _fold(v, stats.get(k, {}) if isinstance(stats, dict)
                  else {}, eps)
