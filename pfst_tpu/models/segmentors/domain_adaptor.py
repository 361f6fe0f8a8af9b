"""Domain-adaptation segmentors (secondary family; mirror of
``rsiseg/models/segmentors/domain_adaptor*.py`` / ``fmda_adaptor*.py``).

These take paired source+target batches per step:

* ``DomainAdaptor`` (``domain_adaptor.py:17``): plain joint supervised
  training on both domains (target labels may be pseudo labels loaded
  by the pipeline).
* ``DomainAdaptorAdv`` (``domain_adaptor_adv.py:31``): adversarial
  entropy alignment — a generator step (segmentation + gen adversarial
  loss against the frozen discriminator) and a discriminator step
  (classify src/trg entropy maps), with two optimizers exactly like the
  reference's dict-of-optimizers train_step.  Both phases fuse into ONE
  jitted function; the two optax updates replace the two ``.step()``
  calls.
* ``DomainAdaptorV2`` / ``FMDAAdaptor`` / ``FMDAAdaptorV2``: aux-loss /
  Fourier-mix variants sharing the same machinery.

Each class is an orchestrator exposing the common
``init_state``/``make_train_step``/``student_variables`` API consumed
by ``pfst_tpu/apis/train.py``.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ...utils.misc import add_prefix
from ..builder import (SEGMENTORS, build_discriminator, build_loss,
                       build_segmentor)
from ..uda.pfgst import parse_losses, uniform_bn_momentum


@struct.dataclass
class AdvTrainState:
    params: Any
    batch_stats: Any
    disc_params: Any
    opt_state: Any
    disc_opt_state: Any
    step: jnp.ndarray


class _DomainAdaptorBase:

    def __init__(self, **cfg):
        self.cfg = cfg
        model_cfg = {
            'type': 'EncoderDecoder',
            'backbone': cfg['backbone'],
            'decode_head': cfg['decode_head'],
            'neck': cfg.get('neck'),
            'auxiliary_head': cfg.get('auxiliary_head'),
            'train_cfg': cfg.get('train_cfg'),
            'test_cfg': cfg.get('test_cfg'),
            'pretrained': cfg.get('pretrained'),
        }
        self.model = build_segmentor(model_cfg)
        self.num_classes = cfg['decode_head']['num_classes']
        self.weight_trg = cfg.get('weight_trg', 1.0)
        # tensors-dict aux losses (``domain_adaptorv2.py``: aux_losses
        # built like the UDA layer's and fed the collected tensors)
        aux = cfg.get('aux_losses')
        if aux is not None and not isinstance(aux, (list, tuple)):
            aux = [aux]
        self.aux_losses = [build_loss(dict(l)) for l in (aux or [])]

    def get_model(self):
        return self.model

    def student_variables(self, state):
        v = {'params': state.params}
        if state.batch_stats:
            v['batch_stats'] = state.batch_stats
        return v

    def inference(self, state, img, **kw):
        return self.model.apply(self.student_variables(state), img,
                                method=self.model.inference, **kw)


@SEGMENTORS.register_module()
class DomainAdaptor(_DomainAdaptorBase):
    """Joint src+trg supervised training (``domain_adaptor.py:17``).

    ``weight_trg`` scales the whole target-domain CE total; the
    reference scales the literal ``loss_ce`` keys in place
    (``domain_adaptor.py:197,211``) — identical for the CE-only heads
    every shipped config uses (a head configured with a differently
    named loss would silently dodge the reference's scaling).  Note
    the reference logs the SCALED trg values; here log_vars carry the
    unscaled per-loss values and only the total applies the weight.
    """

    def __init__(self, **cfg):
        if cfg.get('aux_losses') and type(self) is DomainAdaptor:
            # the reference's plain DomainAdaptor has no such argument
            # (``domain_adaptor.py:20-34``) — tensors-dict aux losses
            # are DomainAdaptorV2's surface
            raise ValueError('plain DomainAdaptor takes no aux_losses '
                             '— use DomainAdaptorV2')
        super().__init__(**cfg)

    def init_state(self, rng, img_shape, tx):
        from ..uda.uda_decorator import UDATrainState
        img = jnp.zeros(img_shape, jnp.float32)
        variables = jax.jit(
            lambda r, im: self.model.init({'params': r}, im,
                                          train=False))(rng, img)
        return UDATrainState(
            params=variables['params'],
            batch_stats=variables.get('batch_stats', {}),
            ema_params={}, ema_batch_stats={},
            opt_state=tx.init(variables['params']),
            step=jnp.zeros((), jnp.int32))

    def make_train_step(self, tx, mean, std, collect_vis=False,
                        donate=True, axis_name=None, jit=True):
        model = self.model

        def step_fn(state, batch, rng):
            # dom1_/dom2_ (MultiDomainDataset) or img/target_*
            # (UDADataset) key conventions both accepted
            img_src = batch.get('dom1_img', batch.get('img'))
            gt_src = batch.get('dom1_gt_semantic_seg',
                               batch.get('gt_semantic_seg'))
            gt_src = gt_src.astype(jnp.int32)
            img_trg = batch.get('dom2_img', batch.get('target_img'))
            gt_trg = batch.get('dom2_gt_semantic_seg',
                               batch.get('target_gt_semantic_seg'))

            bn_m = uniform_bn_momentum(self.cfg) \
                if self.cfg.get('merge_student_passes', True) else None

            def loss_fn(params):
                log_vars = {}
                if gt_trg is not None and bn_m is not None:
                    # Merged {src, trg} pass: one vmapped fwd at batch
                    # 2B instead of two sequential applies — same
                    # per-op-overhead amortization (and exactness
                    # argument) as PFGST.forward_train's merged
                    # student pass; running stats recompose as
                    # m*u_src + u_trg - m*bs0.
                    def one_pass(im, lb, k):
                        (losses, states), ups = model.apply(
                            {'params': params,
                             'batch_stats': state.batch_stats}, im, lb,
                            train=True, mutable=['batch_stats'],
                            rngs={'dropout': k},
                            method=model.forward_train)
                        return losses, states, ups['batch_stats']

                    losses2, states2, ubs2 = jax.vmap(one_pass)(
                        jnp.stack([img_src, img_trg]),
                        jnp.stack([gt_src, gt_trg.astype(jnp.int32)]),
                        jnp.stack([rng, jax.random.fold_in(rng, 1)]))

                    def take(tree, i):
                        return jax.tree.map(lambda a: a[i], tree)

                    l_src, l_trg = take(losses2, 0), take(losses2, 1)
                    total, lv = parse_losses(add_prefix(l_src, 'src'))
                    log_vars.update(lv)
                    t_trg, lv = parse_losses(add_prefix(l_trg, 'trg'))
                    log_vars.update(lv)
                    total = total + t_trg * self.weight_trg
                    bs = jax.tree.map(
                        lambda u, b0: bn_m * u[0] + u[1] - bn_m * b0,
                        ubs2, state.batch_stats)
                else:
                    (l_src, _), upd = model.apply(
                        {'params': params,
                         'batch_stats': state.batch_stats}, img_src,
                        gt_src, train=True, mutable=['batch_stats'],
                        rngs={'dropout': rng},
                        method=model.forward_train)
                    total, lv = parse_losses(add_prefix(l_src, 'src'))
                    log_vars.update(lv)
                    bs = upd['batch_stats']
                    if gt_trg is not None:
                        (l_trg, _), upd = model.apply(
                            {'params': params, 'batch_stats': bs},
                            img_trg, gt_trg.astype(jnp.int32),
                            train=True, mutable=['batch_stats'],
                            rngs={'dropout': jax.random.fold_in(rng,
                                                                1)},
                            method=model.forward_train)
                        t_trg, lv = parse_losses(add_prefix(l_trg,
                                                            'trg'))
                        log_vars.update(lv)
                        total = total + t_trg * self.weight_trg
                        bs = upd['batch_stats']
                return total, (log_vars, bs)

            (total, (log_vars, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            log_vars['loss'] = total
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                log_vars = jax.lax.pmean(log_vars, axis_name)
                bs = jax.lax.pmean(bs, axis_name)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params,
                                      updates)
            return state.replace(params=new_params, batch_stats=bs,
                                 opt_state=new_opt,
                                 step=state.step + 1), log_vars, {}

        return jax.jit(step_fn, donate_argnums=(0,) if donate and jit
                       else ()) if jit else step_fn


@SEGMENTORS.register_module()
class DomainAdaptorAdv(_DomainAdaptorBase):
    """Adversarial entropy alignment (``domain_adaptor_adv.py:31``).

    Phase ordering matches the reference ``train_step``
    (``domain_adaptor_adv.py:260-318``): ONE generator forward
    (source supervised + target logits), then the DISCRIMINATOR
    updates first on detached tensors (:296-305), and the generator's
    adversarial loss is evaluated against the just-UPDATED, frozen
    discriminator (:308-318).  Both phases and both optax updates fuse
    into one jitted program.

    The reference's ``train_cfg.disc_steps`` gate is dead code there:
    ``self.iteration`` is initialised once and never incremented
    (:251-253), so ``curr_iter`` is always 0 and the discriminator
    updates every step — reproduced here by updating every step.
    One deliberate deviation: the reference's logged ``loss`` is
    whatever the LAST ``_parse_losses`` call returned (each call's
    ``loss`` key overwrites the previous — so it logs only the gen
    adversarial term); here ``loss`` is the meaningful
    ``gen_total + disc_total``."""

    def __init__(self, discriminator=None, disc_losses=None,
                 gen_losses=None, **cfg):
        if cfg.get('aux_losses'):
            # only DomainAdaptor(V2) applies tensors-dict aux losses
            # (reference: ``domain_adaptorv2.py`` alone consumes them);
            # fail loudly instead of building-and-ignoring them
            raise ValueError(
                'DomainAdaptorAdv does not support aux_losses — use '
                'gen_losses/disc_losses (or DomainAdaptorV2)')
        super().__init__(**cfg)
        self.discriminator = build_discriminator(
            dict(discriminator or
                 {'type': 'FCDiscriminator',
                  'num_in_channels': self.num_classes}))
        as_list = lambda x: x if isinstance(x, (list, tuple)) else \
            ([x] if x else [])  # noqa: E731
        self.disc_losses = [build_loss(dict(l))
                            for l in as_list(disc_losses)]
        self.gen_losses = [build_loss(dict(l))
                           for l in as_list(gen_losses)]

    def init_state(self, rng, img_shape, tx):
        img = jnp.zeros(img_shape, jnp.float32)
        r1, r2 = jax.random.split(rng)
        variables = jax.jit(
            lambda r, im: self.model.init({'params': r}, im,
                                          train=False))(r1, img)
        ent = jnp.zeros(img_shape[:3] + (self.num_classes,),
                        jnp.float32)
        disc_vars = self.discriminator.init({'params': r2}, ent)
        if isinstance(tx, dict):
            # the reference's optimizer dict keys are 'generator' /
            # 'discriminator' (domain_adaptor_adv.py:303,316)
            tx_model = tx.get('model') or tx.get('generator') or \
                tx.get('backbone') or list(tx.values())[0]
            tx_disc = tx.get('discriminator') or list(tx.values())[-1]
        else:
            tx_model = tx_disc = tx
        self._tx_model, self._tx_disc = tx_model, tx_disc
        return AdvTrainState(
            params=variables['params'],
            batch_stats=variables.get('batch_stats', {}),
            disc_params=disc_vars['params'],
            opt_state=tx_model.init(variables['params']),
            disc_opt_state=tx_disc.init(disc_vars['params']),
            step=jnp.zeros((), jnp.int32))

    def make_train_step(self, tx, mean, std, collect_vis=False,
                        donate=True, axis_name=None, jit=True):
        model, disc = self.model, self.discriminator
        if isinstance(tx, dict):
            tx_model = tx.get('model') or tx.get('generator') or \
                list(tx.values())[0]
            tx_disc = tx.get('discriminator') or list(tx.values())[-1]
        else:
            tx_model = tx_disc = tx

        def forward_tensors(params, bs, img_src, gt_src, img_trg, rng):
            # ONE generator forward feeding both phases
            # (domain_adaptor_adv.py:263-294); BN running stats thread
            # source pass -> target pass (both torch passes run in
            # train mode and update the buffers in place)
            (l_src, st_src), upd = model.apply(
                {'params': params, 'batch_stats': bs}, img_src, gt_src,
                train=True, mutable=['batch_stats'],
                rngs={'dropout': rng}, method=model.forward_train)
            out_trg, upd2 = model.apply(
                {'params': params, 'batch_stats': upd['batch_stats']},
                img_trg, train=True,
                mutable=['batch_stats'],
                rngs={'dropout': jax.random.fold_in(rng, 1)})
            tensors = dict(
                img_src=img_src, img_trg=img_trg,
                logits_src=st_src['seg_logits'],
                logits_trg=out_trg['seg_logits'],
                x_src=st_src['features'], x_trg=out_trg['feats'])
            return l_src, tensors, upd2['batch_stats']

        def step_fn(state, batch, rng):
            img_src = batch.get('dom1_img', batch.get('img'))
            gt_src = batch.get('dom1_gt_semantic_seg',
                               batch.get('gt_semantic_seg'))
            gt_src = gt_src.astype(jnp.int32)
            img_trg = batch.get('dom2_img', batch.get('target_img'))

            def gen_loss_fn(params):
                l_src, tensors, bs = forward_tensors(
                    params, state.batch_stats, img_src, gt_src,
                    img_trg, rng)
                total, log_vars = parse_losses(l_src)

                # ---- discriminator phase FIRST
                # (domain_adaptor_adv.py:296-305): update the disc on
                # detached tensors.  Computed inside the generator's
                # value_and_grad so the single forward is shared; every
                # input is stop_gradient'd, so no second-order terms
                # leak into the generator gradient.
                det = jax.lax.stop_gradient(tensors)

                def disc_loss_fn(disc_params):
                    disc_apply = lambda x: disc.apply(  # noqa: E731
                        {'params': disc_params}, x)
                    d_total = 0.0
                    d_log = {}
                    for dl in self.disc_losses:
                        out = dl(disc_apply, det)
                        t, dlv = parse_losses(out)
                        d_total = d_total + t
                        d_log.update(dlv)
                    return d_total, d_log

                (d_total, d_log), d_grads = jax.value_and_grad(
                    disc_loss_fn, has_aux=True)(state.disc_params)
                if axis_name is not None:
                    d_grads = jax.lax.pmean(d_grads, axis_name)
                dupd, new_dopt = tx_disc.update(d_grads,
                                                state.disc_opt_state,
                                                state.disc_params)
                new_disc = jax.tree.map(lambda p, u: p + u,
                                        state.disc_params, dupd)

                # ---- generator adversarial loss against the UPDATED,
                # frozen discriminator (domain_adaptor_adv.py:308-318)
                frozen = jax.lax.stop_gradient(new_disc)
                disc_apply = lambda x: disc.apply(  # noqa: E731
                    {'params': frozen}, x)
                for gl in self.gen_losses:
                    out = gl(disc_apply, tensors)
                    g_total, g_log = parse_losses(out)
                    total = total + g_total
                    log_vars.update(g_log)
                return total, (log_vars, bs, d_total, d_log, new_disc,
                               new_dopt)

            (g_total, (log_vars, bs, d_total, d_log, new_disc,
                       new_dopt)), g_grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True)(state.params)
            log_vars.update(d_log)
            log_vars['loss'] = g_total + d_total

            if axis_name is not None:
                g_grads = jax.lax.pmean(g_grads, axis_name)
                log_vars = jax.lax.pmean(log_vars, axis_name)
                bs = jax.lax.pmean(bs, axis_name)

            upd, new_opt = tx_model.update(g_grads, state.opt_state,
                                           state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params,
                                      upd)
            return state.replace(
                params=new_params, batch_stats=bs,
                disc_params=new_disc, opt_state=new_opt,
                disc_opt_state=new_dopt,
                step=state.step + 1), log_vars, {}

        return jax.jit(step_fn, donate_argnums=(0,) if donate and jit
                       else ()) if jit else step_fn


@SEGMENTORS.register_module()
class DomainAdaptorV2(DomainAdaptor):
    """aux-loss variant (``domain_adaptorv2.py:31``).

    The reference V2 step (``domain_adaptorv2.py:245-291``) has NO
    supervised target loss: total = source decode CE + tensors-dict
    aux losses + source aux CE.  The target pass is a plain forward
    feeding ``logits_trg`` / ``logits_trg_aux`` / ``x_trg`` into the
    aux losses, and ``logits_src`` is NOT detached (:268-281) — aux
    losses may backprop through the source logits too.  ``weight_trg``
    is accepted-but-dead exactly as in the reference (defined
    :50,70, never read).  ``aux_seg_net`` is accepted-but-ignored:
    its only consumer, the reference ``PseudoLabelLoss``, is
    unrunnable dev code (unconditional ``pdb.set_trace()``, a
    nonexistent ``F.cross_entropy_loss`` —
    ``pseudo_label_loss.py:36-42``); the runnable semantics live in
    this repo's ``PseudoLabelLoss`` via the ``logits_ema`` tensor key.
    """

    def __init__(self, aux_seg_net=None, **cfg):
        super().__init__(**cfg)

    def make_train_step(self, tx, mean, std, collect_vis=False,
                        donate=True, axis_name=None, jit=True):
        model = self.model

        def step_fn(state, batch, rng):
            img_src = batch.get('dom1_img', batch.get('img'))
            gt_src = batch.get('dom1_gt_semantic_seg',
                               batch.get('gt_semantic_seg'))
            gt_src = gt_src.astype(jnp.int32)
            img_trg = batch.get('dom2_img', batch.get('target_img'))
            gt_trg = batch.get('dom2_gt_semantic_seg',
                               batch.get('target_gt_semantic_seg'))

            def loss_fn(params):
                # source supervised pass (domain_adaptorv2.py:250-265)
                (l_src, st_src), upd = model.apply(
                    {'params': params,
                     'batch_stats': state.batch_stats}, img_src, gt_src,
                    train=True, mutable=['batch_stats'],
                    rngs={'dropout': rng}, method=model.forward_train)
                total, log_vars = parse_losses(l_src)
                # plain target forward, no CE; BN stats thread through
                out_trg, upd2 = model.apply(
                    {'params': params,
                     'batch_stats': upd['batch_stats']}, img_trg,
                    train=True, mutable=['batch_stats'],
                    rngs={'dropout': jax.random.fold_in(rng, 1)})
                bs = upd2['batch_stats']
                tensors = dict(
                    img_src=img_src, img_trg=img_trg,
                    gt_src=gt_src, gt_trg=gt_trg,
                    x_src=st_src['features'], x_trg=out_trg['feats'],
                    logits_src=st_src['seg_logits'],
                    logits_trg=out_trg['seg_logits'],
                    logits_trg_aux=out_trg['aux_logits'])
                aux = {}
                for lm in self.aux_losses:
                    out = lm(tensors)
                    if out:
                        aux.update(out)
                aux = {k: v for k, v in aux.items()
                       if not k.startswith('vis|')}
                if aux:
                    a_total, lv = parse_losses(aux)
                    log_vars.update(lv)
                    total = total + a_total
                return total, (log_vars, bs)

            (total, (log_vars, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            log_vars['loss'] = total
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                log_vars = jax.lax.pmean(log_vars, axis_name)
                bs = jax.lax.pmean(bs, axis_name)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params,
                                      updates)
            return state.replace(params=new_params, batch_stats=bs,
                                 opt_state=new_opt,
                                 step=state.step + 1), log_vars, {}

        return jax.jit(step_fn, donate_argnums=(0,) if donate and jit
                       else ()) if jit else step_fn


@SEGMENTORS.register_module()
class FMDAAdaptor(DomainAdaptor):
    """Feature-map domain adaptor (``fmda_adaptor.py:17,190-270``).

    Joint src+trg supervised training plus a ``loss_sim_feat``
    regularizer over *precomputed* neighborhood-similarity maps
    carried in the batch (keys containing ``sim_feat``, loaded by
    ``LoadAnnotationsPseudoLabelsV2(load_feats=True)`` from the
    offline generator's h5 corpus).  The reference replays each map
    into the augmented frame per sample (``fmda_adaptor.py:200-213``);
    here rot/flip replay runs in-step when the batch carries the
    recorded meta arrays (``KeepOriImage`` pipeline), and the maps are
    resized (nearest) to ``pre_feat_shape``/logit resolution.
    """

    feat_key_filter = 'feat'   # raw features (fmda_adaptor.py:197)

    def __init__(self, **cfg):
        super().__init__(**cfg)
        self.pre_feat_shape = cfg.get('pre_feat_shape')
        self.loss_sim_feat = build_loss(cfg['loss_sim_feat']) \
            if cfg.get('loss_sim_feat') else None

    def make_train_step(self, tx, mean, std, collect_vis=False,
                        donate=True, axis_name=None, jit=True):
        model = self.model

        def step_fn(state, batch, rng):
            # MultiDomainDataset emits dom1_/dom2_ keys (the reference
            # input of this family, ``fmda_adaptor.py:190-191``);
            # UDADataset emits img/target_* — accept both.
            img_src = batch.get('dom1_img', batch.get('img'))
            gt_src = batch.get('dom1_gt_semantic_seg',
                               batch.get('gt_semantic_seg'))
            gt_src = gt_src.astype(jnp.int32)
            img_trg = batch.get('dom2_img', batch.get('target_img'))
            gt_trg = batch.get('dom2_gt_semantic_seg',
                               batch.get('target_gt_semantic_seg'))
            # V1 collects raw-feature keys ('feat',
            # ``fmda_adaptor.py:197``) for FeatSimLoss; V2 collects
            # precomputed sim maps ('sim_feat',
            # ``fmda_adaptor_v2.py``) for FeatSimLossV2
            sim_keys = sorted(
                k for k in batch
                if self.feat_key_filter in k and
                hasattr(batch[k], 'ndim') and
                not any(m in k for m in ('rotate', 'flip')))

            def loss_fn(params):
                from ...ops import resize as _resize
                from ..utils.pfst_transforms import transform_by_metas
                log_vars = {}
                (l_src, st_src), upd = model.apply(
                    {'params': params,
                     'batch_stats': state.batch_stats}, img_src, gt_src,
                    train=True, mutable=['batch_stats'],
                    rngs={'dropout': rng},
                    method=model.forward_train)
                total, lv = parse_losses(add_prefix(l_src, 'src.dec'))
                log_vars.update(lv)
                bs = upd['batch_stats']

                trg_labels = gt_trg.astype(jnp.int32) if gt_trg is not \
                    None else jnp.full(img_trg.shape[:3], 255, jnp.int32)
                (l_trg, st_trg), upd = model.apply(
                    {'params': params, 'batch_stats': bs}, img_trg,
                    trg_labels, train=True, mutable=['batch_stats'],
                    rngs={'dropout': jax.random.fold_in(rng, 1)},
                    method=model.forward_train)
                t_trg, lv = parse_losses(add_prefix(l_trg, 'trg.dec'))
                log_vars.update(lv)
                total = total + t_trg * self.weight_trg
                bs = upd['batch_stats']

                if self.loss_sim_feat is not None and sim_keys:
                    trg_logits = st_trg['seg_logits']
                    metas = {}
                    for k in ('rotate_k', 'flip_vertical',
                              'flip_horizontal'):
                        if f'dom2_{k}' in batch:
                            metas[k] = batch[f'dom2_{k}']
                        elif k in batch:
                            metas[k] = batch[k]
                    aug_list = []
                    for k in sim_keys:
                        data = batch[k]
                        if self.pre_feat_shape is not None:
                            data = _resize(
                                data, size=tuple(self.pre_feat_shape),
                                mode='nearest')
                        if metas:
                            data = transform_by_metas(data, metas)
                        aug_list.append(data)
                    l_sim, _ = self.loss_sim_feat(aug_list, trg_logits)
                    s_total, lv = parse_losses(l_sim)
                    log_vars.update(lv)
                    total = total + s_total
                return total, (log_vars, bs)

            (total, (log_vars, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            log_vars['loss'] = total
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                log_vars = jax.lax.pmean(log_vars, axis_name)
                bs = jax.lax.pmean(bs, axis_name)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params,
                                      updates)
            return state.replace(params=new_params, batch_stats=bs,
                                 opt_state=new_opt,
                                 step=state.step + 1), log_vars, {}

        return jax.jit(step_fn, donate_argnums=(0,) if donate and jit
                       else ()) if jit else step_fn


@SEGMENTORS.register_module()
class FMDAAdaptorV2(FMDAAdaptor):
    """(``fmda_adaptor_v2.py``) consumes *precomputed* similarity maps
    ('sim_feat' batch keys, no pre_feat_shape) with FeatSimLossV2."""

    feat_key_filter = 'sim_feat' 
