"""Optimizer + LR schedule builders (optax).

Mirrors the reference's optimizer surface: AdamW/SGD from ``optimizer``
cfg (``configs/_base_/schedules/adamw_40k.py:4-5``), poly-with-linear-
warmup decay from ``lr_config`` (``adamw_40k.py:9-16``), multi-optimizer
dict-of-dicts for adversarial adaptors (``rsiseg/core/builder.py:36-90``)
and ``paramwise_cfg`` multipliers (lr_mult/decay_mult on matching
submodule names).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def build_lr_schedule(lr_config: Optional[dict], base_lr: float,
                      max_iters: int):
    """poly power-p decay with linear warmup (mmcv PolyLrUpdater)."""
    if lr_config is None:
        return base_lr
    cfg = dict(lr_config)
    policy = cfg.get('policy', 'poly')
    warmup = cfg.get('warmup', None)
    warmup_iters = cfg.get('warmup_iters', 0)
    warmup_ratio = cfg.get('warmup_ratio', 1e-6)
    power = cfg.get('power', 1.0)
    min_lr = cfg.get('min_lr', 0.0)

    policy = str(policy)
    policy = {'cosineannealing': 'CosineAnnealing'}.get(
        policy.lower(), policy.lower()
        if policy.lower() in ('poly', 'fixed', 'step', 'exp', 'inv',
                              'linear') else policy)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        progress = jnp.clip(step / max_iters, 0.0, 1.0)
        if policy == 'poly':
            # (max_iters - step)/max_iters, NOT 1 - step/max_iters:
            # the latter cancels catastrophically in float32 near the
            # end of training (rel. error ~2e-3 at iter 39999/40000)
            remaining = jnp.clip((max_iters - step) / max_iters,
                                 0.0, 1.0)
            lr = (base_lr - min_lr) * remaining**power + min_lr
        elif policy == 'fixed':
            lr = jnp.asarray(base_lr)
        elif policy == 'step':
            gamma = cfg.get('gamma', 0.1)
            milestones = jnp.asarray(cfg['step'], jnp.float32)
            lr = base_lr * gamma**jnp.sum(step >= milestones)
        elif policy == 'exp':
            # mmcv ExpLrUpdater: lr * gamma**progress_iters
            lr = base_lr * cfg.get('gamma', 0.99)**step
        elif policy == 'inv':
            # mmcv InvLrUpdater: lr * (1 + gamma*iter)^-power
            lr = base_lr * (1.0 + cfg.get('gamma', 0.1)
                            * step)**(-power)
        elif policy == 'CosineAnnealing':
            # mmcv CosineAnnealingLrUpdater: cosine from base to
            # min_lr (or base*min_lr_ratio) over max_iters
            target = cfg.get('min_lr')
            if target is None:
                target = base_lr * cfg.get('min_lr_ratio', 0.0)
            lr = target + 0.5 * (base_lr - target) * (
                1.0 + jnp.cos(jnp.pi * progress))
        elif policy == 'linear':
            # mmcv LinearAnnealingLrUpdater
            target = cfg.get('min_lr')
            if target is None:
                target = base_lr * cfg.get('min_lr_ratio', 0.0)
            lr = base_lr + (target - base_lr) * progress
        else:
            raise ValueError(f'unsupported lr policy {policy}')
        if warmup == 'linear' and warmup_iters > 0:
            k = jnp.clip(step / warmup_iters, 0.0, 1.0)
            wfactor = warmup_ratio + (1.0 - warmup_ratio) * k
            lr = jnp.where(step < warmup_iters, lr * wfactor, lr)
        elif warmup == 'constant' and warmup_iters > 0:
            lr = jnp.where(step < warmup_iters, lr * warmup_ratio, lr)
        elif warmup == 'exp' and warmup_iters > 0:
            k = jnp.clip(step / warmup_iters, 0.0, 1.0)
            lr = jnp.where(step < warmup_iters, lr * warmup_ratio**(1 - k),
                           lr)
        return lr

    return schedule


def _paramwise_mask_fn(paramwise_cfg: dict):
    custom_keys = paramwise_cfg.get('custom_keys', {})

    def label(path: str):
        for key in sorted(custom_keys, key=len, reverse=True):
            if key in path:
                return key
        return '__default__'

    return label, custom_keys


def _layer_id_from_path(path: str, num_layers: int) -> int:
    """Map a param path to its depth for layerwise LR decay
    (mirror of ``rsiseg/core/optimizers/layer_decay_optimizer_
    constructor.py:103,189``): stems/embeddings -> 0, block i -> i+1,
    heads -> num_layers+1."""
    import re
    if any(k in path for k in ('stem', 'patch_embed', 'pos_embed',
                               'cls_token', 'conv1')):
        return 0
    m = re.search(
        r'(?:blocks?|layers?|stages?)[._]?(\d+)[_.]?(?:blocks?)?[._]?(\d+)?',
        path)
    if m and 'backbone' in path:
        major = int(m.group(1))
        minor = int(m.group(2) or 0)
        return min(major + minor, num_layers)
    if 'backbone' in path:
        return num_layers // 2
    return num_layers + 1


def layer_decay_transforms(paramwise_cfg: dict, make):
    """Build an optax.multi_transform labeling for layerwise decay."""
    import jax
    num_layers = paramwise_cfg.get('num_layers', 12)
    decay_rate = paramwise_cfg.get('decay_rate', 0.9)
    transforms = {}
    for lid in range(num_layers + 2):
        mult = decay_rate**(num_layers + 1 - lid)
        transforms[f'layer_{lid}'] = make(lr_mult=mult)

    def path_labels(params):
        def lbl(path, _):
            s = '/'.join(str(getattr(p, 'key', p)) for p in path)
            return f'layer_{_layer_id_from_path(s, num_layers)}'

        return jax.tree_util.tree_map_with_path(lbl, params)

    return optax.multi_transform(transforms, path_labels)


def build_optimizer(optimizer_cfg: dict,
                    lr_config: Optional[dict] = None,
                    max_iters: int = 40000,
                    grad_clip: Optional[dict] = None,
                    cumulative_iters: int = 1,
                    skip_nonfinite: int = 0):
    """Build an optax GradientTransformation from reference-style cfg.

    ``cumulative_iters`` > 1 (mmcv ``GradientCumulativeOptimizerHook``
    surface: ``optimizer_config = dict(cumulative_iters=k)``) wraps the
    transform in ``optax.MultiSteps``: every step computes fwd+bwd on
    its own micro-batch and the mean gradient is applied once per k
    iterations — effective batch = k × samples_per_gpu with unchanged
    per-iteration memory. Iter-indexed schedules (poly over
    ``runner.max_iters``) keep reference semantics: the inner schedule
    is indexed by the micro-iteration at which each update applies.

    ``skip_nonfinite`` > 0 (``optimizer_config =
    dict(skip_nonfinite=N)``) wraps everything in
    ``optax.apply_if_finite``: an iteration whose gradients contain
    NaN/Inf leaves params and optimizer state untouched (bad batch,
    bf16 overflow) instead of poisoning the run; after N consecutive
    non-finite iterations the update propagates so the failure is
    visible. Neither mmcv's OptimizerHook nor the reference has an
    equivalent — a NaN there silently destroys the checkpoint.
    """
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type', 'AdamW')
    base_lr = cfg.pop('lr', 1e-3)
    paramwise_cfg = cfg.pop('paramwise_cfg', None)
    # mmcv constructor names (``core/optimizers/layer_decay_optimizer_
    # constructor.py:103,189``): both select the layer-decay path here
    constructor = cfg.pop('constructor', None)
    if constructor in ('LearningRateDecayOptimizerConstructor',
                       'LayerDecayOptimizerConstructor'):
        paramwise_cfg = dict(paramwise_cfg or {})
        if constructor == 'LayerDecayOptimizerConstructor':
            # deprecated BEiT spelling (:188-209): forces
            # layer_wise decay and renames layer_decay_rate
            paramwise_cfg['decay_type'] = 'layer_wise'
            if 'layer_decay_rate' in paramwise_cfg:
                paramwise_cfg['decay_rate'] = \
                    paramwise_cfg.pop('layer_decay_rate')
        else:
            paramwise_cfg.setdefault('decay_type', 'layer_wise')
    elif constructor not in (None, 'DefaultOptimizerConstructor'):
        raise ValueError(f'unsupported constructor {constructor}')
    schedule = build_lr_schedule(lr_config, base_lr, max_iters)
    cum_k = max(int(cumulative_iters or 1), 1)
    if cum_k > 1 and callable(schedule):
        iter_schedule = schedule
        schedule = lambda s: iter_schedule(  # noqa: E731
            s * cum_k + (cum_k - 1))

    def make(lr_mult=1.0, decay_mult=1.0):
        if callable(schedule):
            lr = lambda s: schedule(s) * lr_mult  # noqa: E731
        else:
            lr = schedule * lr_mult
        if opt_type == 'AdamW':
            b1, b2 = cfg.get('betas', (0.9, 0.999))
            tx = optax.adamw(
                lr, b1=b1, b2=b2, eps=cfg.get('eps', 1e-8),
                weight_decay=cfg.get('weight_decay', 0.0) * decay_mult)
        elif opt_type == 'Adam':
            b1, b2 = cfg.get('betas', (0.9, 0.999))
            tx = optax.adam(lr, b1=b1, b2=b2)
        elif opt_type == 'SGD':
            tx = optax.chain(
                optax.add_decayed_weights(
                    cfg.get('weight_decay', 0.0) * decay_mult),
                optax.sgd(lr, momentum=cfg.get('momentum', 0.0),
                          nesterov=cfg.get('nesterov', False)))
        else:
            raise ValueError(f'unsupported optimizer {opt_type}')
        return tx

    if paramwise_cfg and paramwise_cfg.get('decay_type') in (
            'layer_wise', 'stage_wise'):
        tx = layer_decay_transforms(paramwise_cfg, make)
    elif paramwise_cfg:
        label_fn, custom_keys = _paramwise_mask_fn(paramwise_cfg)
        transforms = {'__default__': make()}
        for key, spec in custom_keys.items():
            transforms[key] = make(spec.get('lr_mult', 1.0),
                                   spec.get('decay_mult', 1.0))

        def path_labels(params):
            flat = jax.tree_util.tree_flatten_with_path(params)[0]

            def lbl(path, _):
                s = '/'.join(str(getattr(p, 'key', p)) for p in path)
                return label_fn(s)

            return jax.tree_util.tree_map_with_path(lbl, params)

        tx = optax.multi_transform(transforms, path_labels)
    else:
        tx = make()

    if grad_clip:
        tx = optax.chain(
            optax.clip_by_global_norm(grad_clip.get('max_norm', 1.0)), tx)
    if cum_k > 1:
        # clip applies to the accumulated mean gradient (the reference
        # hook also clips at step time, mmcv OptimizerHook semantics)
        tx = optax.MultiSteps(tx, every_k_schedule=cum_k)
    if skip_nonfinite:
        # outermost: non-finite grads never reach the inner update, so
        # clip/MultiSteps-accumulator/moment state all stay clean
        tx = optax.apply_if_finite(tx, int(skip_nonfinite))
    return tx


def build_optimizers(cfg: dict, lr_config=None, max_iters=40000,
                     grad_clip=None, cumulative_iters=1,
                     skip_nonfinite: int = 0) -> Any:
    """Multi-optimizer support (``core/builder.py:36-90``): a dict of
    optimizer cfgs (one per submodule) yields a dict of transforms."""
    if 'type' in cfg:
        return build_optimizer(cfg, lr_config, max_iters, grad_clip,
                               cumulative_iters, skip_nonfinite)
    return {name: build_optimizer(sub, lr_config, max_iters, grad_clip,
                                  cumulative_iters, skip_nonfinite)
            for name, sub in cfg.items()}
