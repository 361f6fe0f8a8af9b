"""PFGST: pseudo-features guided self-training (the shipped algorithm).

TPU-native re-design of ``rsiseg/models/uda/pfgst.py:54-368``.  One
training iteration — EMA teacher update, source supervised pass,
teacher pseudo-labeling on the target batch, confidence weighting,
ClassMix + color-jitter/blur strong augmentation, mixed-pass training
and the PFGST neighborhood-similarity losses — compiles into a single
jitted function of the immutable train state.  The reference executes
this as Python orchestration over three nn.Modules with per-sample
loops and host syncs; the fused step is where the TPU throughput comes
from.

Loss accounting matches ``BaseSegmentor._parse_losses``
(``segmentors/base.py:177-222``): every returned key containing
``loss`` sums into the total; all scalars are logged.
"""
from __future__ import annotations

import copy
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.misc import add_prefix
from ..builder import UDA, build_loss
from ..utils.dacs_transforms import get_class_masks, strong_transform
from .uda_decorator import (UDADecorator, UDATrainState,
                            maybe_normalize_images)


def parse_losses(losses: Dict[str, jnp.ndarray]):
    """Sum '*loss*' keys -> total; everything scalar goes to log_vars."""
    log_vars = {}
    total = 0.0
    for name, value in losses.items():
        if name.startswith('vis|'):
            continue
        value = jnp.mean(value)
        log_vars[name] = value
        if 'loss' in name:
            total = total + value
    return total, log_vars


def uniform_bn_momentum(model_cfg) -> Optional[float]:
    """Uniform flax-convention BN momentum (1 - torch momentum) found
    anywhere in ``model_cfg``'s ``norm_cfg`` entries, or None when BN
    layers disagree — merged multi-pass steps then fall back to the
    sequential path, because their exact running-stat composition
    needs one scalar momentum."""
    moms = set()

    def scan(d):
        if isinstance(d, dict):
            for k, v in d.items():
                if k == 'norm_cfg' and isinstance(v, dict):
                    if v.get('type', 'BN') in ('BN', 'BN2d', 'SyncBN'):
                        moms.add(1.0 - v.get('momentum', 0.1))
                else:
                    scan(v)
        elif isinstance(d, (list, tuple)):
            for v in d:
                scan(v)

    scan(model_cfg)
    if not moms:
        moms.add(0.9)  # Norm default: BN, torch momentum 0.1
    return moms.pop() if len(moms) == 1 else None


@UDA.register_module()
class PFGST(UDADecorator):
    """The PFST paper's algorithm (cfg surface mirrors ``pfgst.py:56``)."""

    def __init__(self, **cfg):
        super().__init__(**cfg)
        self.alpha = cfg['alpha']
        self.pseudo_threshold = cfg['pseudo_threshold']
        self.psweight_ignore_top = cfg.get('pseudo_weight_ignore_top', 0)
        self.psweight_ignore_bottom = cfg.get(
            'pseudo_weight_ignore_bottom', 0)
        self.fdist_lambda = cfg.get('imnet_feature_dist_lambda', 0)
        self.enable_fdist = self.fdist_lambda > 0
        self.mix = cfg.get('mix', 'class')
        self.blur = cfg.get('blur', True)
        self.color_jitter_s = cfg.get('color_jitter_strength', 0.2)
        self.color_jitter_p = cfg.get('color_jitter_probability', 0.2)
        self.trg_loss_weight = cfg.get('trg_loss_weight', 1.0)
        self.use_decoded_feats = cfg.get('use_decoded_feats', False)
        self.thre_type = cfg.get('thre_type', 'all')
        self.strong_aug_denorm_type = cfg.get('strong_aug_denorm_type',
                                              'mean_std')
        self.apply_no_mix = cfg.get('apply_no_mix', False)
        self.print_grad_magnitude = cfg.get('print_grad_magnitude',
                                            False)
        # merge the source and mixed student passes into ONE vmapped
        # fwd+bwd (see forward_train): per-op granularity doubles —
        # the measured bottleneck at the shipped batch sizes is per-op
        # fixed cost, not FLOPs (PERF.md "per-op roofline dissection")
        self.merge_student_passes = cfg.get('merge_student_passes',
                                            True)
        assert self.mix == 'class'
        aux_losses = cfg.get('aux_losses', None)
        if aux_losses is not None and not isinstance(aux_losses, (list,
                                                                  tuple)):
            aux_losses = [aux_losses]
        self.aux_losses = [build_loss(dict(l)) for l in (aux_losses or [])]
        self.apply_aux = bool(self.aux_losses)

    # which view of the target image feeds the ClassMix blend:
    # PFGST mixes the strongly-augmented view (``pfgst.py:289``), DACS
    # the plain target image (``dacs.py:253``)
    mix_view = 'strong_aug'
    # variants that pre-transform the batch in forward_train (PFSTV4)
    # must not split: the premix program would see the raw batch
    supports_split_compile = True
    # PGST (``pgst.py:108-115``): additionally ClassMix-blend the
    # teacher's feature map with the (detached) source feature map at
    # this level before the similarity losses; None disables.
    mix_ema_feat_level = None
    # FMDA/PGSTTRG-style: train on the strongly-augmented target view
    # directly instead of ClassMix (``fmda.py:309-325``)
    target_self_training = False
    # which strong view the self-training pass consumes:
    # 'jitter_plain' (FMDA, ``fmda.py:309-315``): in-step
    # ``strong_transform`` jitter/blur of the PLAIN target image;
    # 'pipeline_strong' (PGSTTRG, ``pgst_trg.py:270-279``): the data
    # pipeline's ``target_img_strong_aug`` AS-IS, no extra transform.
    self_training_view = 'jitter_plain'

    def _bn_flax_momentum(self):
        return uniform_bn_momentum(self.cfg.get('model', {}))

    def feat_dist_loss(self, params, imnet_params, img, gt, src_feat):
        """DACS ImageNet feature-distance regulariser: L2 distance
        between student and frozen-init backbone features on
        (optionally) ``imnet_feature_dist_classes`` pixels.

        Note: the reference declares the machinery
        (``dacs.py:61-63,151-160``, imnet model at ``:80-83``) but its
        ``forward_train`` never calls ``masked_feat_dist`` — the
        DAFormer-inherited loss was stripped to dead code.  Here the
        loss is functional when ``imnet_feature_dist_lambda > 0``
        (the declared-but-dead ``imnet_feature_dist_scale_min_ratio``
        knob is accepted and ignored the same way)."""
        model = self.model
        # frozen copy runs train-mode BN (the reference never switches
        # its imnet model to eval), stats discarded
        feats, _ = model.apply(
            {'params': jax.lax.stop_gradient(imnet_params)}, img,
            train=True, mutable=['batch_stats'],
            method=model.extract_feat)
        f_imnet = jax.lax.stop_gradient(feats[-1])
        f_stu = src_feat[-1] if isinstance(src_feat, (tuple, list)) \
            else src_feat
        diff = jnp.sqrt(jnp.sum((f_stu - f_imnet)**2, axis=-1) + 1e-12)
        fd_classes = self.cfg.get('imnet_feature_dist_classes')
        if fd_classes:
            scale = gt.shape[1] // f_stu.shape[1]
            gt_small = gt[:, ::scale, ::scale]
            mask = jnp.zeros_like(gt_small, dtype=bool)
            for c in fd_classes:
                mask = mask | (gt_small == c)
            from ..losses.utils import masked_mean
            fd = masked_mean(diff, mask)
        else:
            fd = jnp.mean(diff)
        return self.fdist_lambda * fd

    # ------------------------------------------------------------------
    def teacher_forward(self, ema_params, ema_batch_stats, target_img):
        """Teacher forward (``pfgst.py:253-257``): train-mode BN
        (batch statistics of the target batch), dropout frozen (no
        dropout rng), stats not persisted."""
        model = self.model
        (ema_logits, ema_states), _ = model.apply(
            {'params': jax.lax.stop_gradient(ema_params),
             'batch_stats': ema_batch_stats},
            target_img, train=True, mutable=['batch_stats'],
            method=model.encode_decode)
        ema_logits = jax.lax.stop_gradient(ema_logits)
        ema_feats = jax.lax.stop_gradient(
            ema_states['decoded_features'] if self.use_decoded_feats
            else ema_states['feats'])
        return ema_logits, ema_feats

    def teacher_and_mix(self, ema_params, ema_batch_stats, batch, rng,
                        mean, std, teacher_out=None):
        """Gradient-free half of the iteration: teacher forward,
        pseudo-labeling and ClassMix/strong-aug
        (``pfgst.py:247-300``).  Separable so the halves can compile as
        independent XLA programs (``split_compile``); with
        ``teacher_out`` given the teacher forward was run in its own
        program."""
        img = batch['img']
        gt = batch['gt_semantic_seg'].astype(jnp.int32)
        target_img = batch['target_img']
        target_img_strong = batch.get('target_img_strong_aug',
                                      target_img)
        b, h, w, _ = img.shape
        (_k_drop_src, _k_drop_mix, k_mix, k_gate_j, k_gate_b,
         k_strong) = jax.random.split(rng, 6)

        if teacher_out is None:
            teacher_out = self.teacher_forward(ema_params,
                                               ema_batch_stats,
                                               target_img)
        ema_logits, ema_feats = teacher_out

        ema_softmax = jax.nn.softmax(ema_logits.astype(jnp.float32),
                                     axis=-1)
        pseudo_prob = jnp.max(ema_softmax, axis=-1)      # (B,H,W)
        pseudo_label = jnp.argmax(ema_softmax,
                                  axis=-1).astype(jnp.int32)
        ps_large_p = (pseudo_prob >= self.pseudo_threshold)
        if self.thre_type == 'all':
            frac = jnp.mean(ps_large_p.astype(jnp.float32))
            pseudo_weight = jnp.full_like(pseudo_prob, 1.0) * frac
        elif self.thre_type == 'part':
            pseudo_weight = ps_large_p.astype(jnp.float32)
        else:
            raise ValueError(self.thre_type)
        if self.psweight_ignore_top > 0:
            rows = jnp.arange(h)[None, :, None]
            pseudo_weight = jnp.where(rows < self.psweight_ignore_top,
                                      0.0, pseudo_weight)
        if self.psweight_ignore_bottom > 0:
            rows = jnp.arange(h)[None, :, None]
            pseudo_weight = jnp.where(
                rows >= h - self.psweight_ignore_bottom, 0.0,
                pseudo_weight)

        # ---- ClassMix + strong aug (``pfgst.py:280-300``) -----------
        if self.target_self_training or self.apply_no_mix:
            mix_masks = jnp.zeros((b, h, w), jnp.float32)
            trg_img = target_img
        else:
            mix_masks = get_class_masks(k_mix, gt, self.num_classes)
            trg_img = target_img_strong if self.mix_view == \
                'strong_aug' else target_img
        jitter_gate = jax.random.uniform(k_gate_j, ())
        # host-side scalar, NOT jnp.zeros(()): a device-array constant
        # captured by a traced function must round-trip to host for
        # MLIR constant embedding, which the tunneled backend rejects
        import numpy as _np
        blur_gate = jax.random.uniform(k_gate_b, ()) if self.blur \
            else _np.float32(0.0)
        sample_keys = jax.random.split(k_strong, b)

        def per_sample(key, m, im_s, im_t, g, pl, pw):
            mixed_img, mixed_lbl = strong_transform(
                key, m,
                data_pair=(im_s, im_t),
                target_pair=(g.astype(jnp.float32),
                             pl.astype(jnp.float32)),
                jitter_gate=jitter_gate, blur_gate=blur_gate,
                color_jitter_s=self.color_jitter_s,
                color_jitter_p=self.color_jitter_p,
                mean=mean, std=std,
                denorm_type=self.strong_aug_denorm_type)
            _, mixed_w = strong_transform(
                key, m, target_pair=(jnp.ones_like(pw), pw))
            return mixed_img, mixed_lbl, mixed_w

        if self.target_self_training and \
                self.self_training_view == 'pipeline_strong':
            # PGSTTRG (``pgst_trg.py:270-279``): the student trains on
            # the pipeline's strong-aug view directly against the raw
            # pseudo-labels; no strong_transform, weight untransformed
            mixed_img, mixed_lbl = target_img_strong, pseudo_label
        elif self.target_self_training:
            # FMDA: strong-augment the whole PLAIN target image,
            # train against the pseudo labels (``fmda.py:309-325``)
            def per_sample_trg(key, im_t, pl):
                aug, lbl = strong_transform(
                    key, jnp.zeros(im_t.shape[:2], jnp.float32),
                    data_pair=(im_t, im_t),
                    target_pair=(pl.astype(jnp.float32),
                                 pl.astype(jnp.float32)),
                    jitter_gate=jitter_gate, blur_gate=blur_gate,
                    color_jitter_s=self.color_jitter_s,
                    color_jitter_p=self.color_jitter_p,
                    mean=mean, std=std,
                    denorm_type=self.strong_aug_denorm_type)
                return aug, lbl

            mixed_img, mixed_lbl = jax.vmap(per_sample_trg)(
                sample_keys, target_img, pseudo_label)
        else:
            mixed_img, mixed_lbl, pseudo_weight = jax.vmap(per_sample)(
                sample_keys, mix_masks, img, trg_img,
                gt, pseudo_label, pseudo_weight)
        out = dict(
            ema_logits=ema_logits,
            ema_feats=ema_feats,
            pseudo_label=pseudo_label,
            pseudo_weight=pseudo_weight,
            mix_masks=mix_masks,
            mixed_img=mixed_img,
            mixed_lbl=mixed_lbl.astype(jnp.int32))
        if getattr(self, 'mix_feat_teacher_forward', False) and not \
                self.target_self_training:
            # PGSTMixFeat (``pgst_mix_feat.py:273-277,293-295``): the
            # second teacher forward consumes a WEAK mix — the same
            # ClassMix masks and jitter draw applied to the PLAIN
            # target view — not the student's strong-view blend
            def per_sample_weak(key, m, im_s, im_t, g, pl):
                weak, _ = strong_transform(
                    key, m, data_pair=(im_s, im_t),
                    target_pair=(g.astype(jnp.float32),
                                 pl.astype(jnp.float32)),
                    jitter_gate=jitter_gate, blur_gate=blur_gate,
                    color_jitter_s=self.color_jitter_s,
                    color_jitter_p=self.color_jitter_p,
                    mean=mean, std=std,
                    denorm_type=self.strong_aug_denorm_type)
                return weak

            out['mixed_img_weak'] = jax.vmap(per_sample_weak)(
                sample_keys, mix_masks, img, target_img, gt,
                pseudo_label)
        return out

    def forward_train(self, params, batch_stats, ema_params,
                      ema_batch_stats, step, batch, rng,
                      mean, std, collect_vis: bool = False,
                      imnet_params=None, premix=None):
        """One PFGST iteration's loss (pure; differentiated wrt params).

        Mirrors ``pfgst.py:179-356``.  Returns (total_loss, aux_out).
        With ``premix`` given (split_compile), the teacher/mix half was
        computed by ``teacher_and_mix`` in a separate program.
        """
        model = self.model
        img = batch['img']
        gt = batch['gt_semantic_seg'].astype(jnp.int32)

        (k_drop_src, k_drop_mix, _k_mix, _k_gate_j, _k_gate_b,
         _k_strong) = jax.random.split(rng, 6)

        log_vars: Dict[str, jnp.ndarray] = {}
        vis_states: Dict[str, Any] = {}

        if premix is None:
            premix = self.teacher_and_mix(ema_params, ema_batch_stats,
                                          batch, rng, mean, std)
        ema_logits = premix['ema_logits']
        ema_feats = premix['ema_feats']
        pseudo_weight = premix['pseudo_weight']
        mix_masks = premix['mix_masks']
        mixed_img = premix['mixed_img']
        mixed_lbl = premix['mixed_lbl']
        mix_prefix = 'trg' if self.target_self_training else 'mix'

        bn_m = self._bn_flax_momentum() if self.merge_student_passes \
            else None
        if bn_m is not None:
            # ---- MERGED student passes (``pfgst.py:225-237,303-310``)
            # One vmapped fwd+bwd over {source, mixed}: every conv runs
            # at batch 2B, halving the op count whose per-op fixed cost
            # dominates the step at small batches (PERF.md).  Exactness
            # vs the sequential path:
            #   * train-mode BN normalizes by BATCH statistics, which
            #     vmap computes per-slice — identical to two passes;
            #     the input running stats are written, never read;
            #   * dropout keys are the same per-pass keys, so the masks
            #     match the sequential calls bit-for-bit;
            #   * source seg_weight=1 ≡ seg_weight=None (the weight
            #     multiplies the per-pixel loss before the same mean);
            #   * the sequential running-stat chain
            #     bs2 = m*bs1 + (1-m)*mu2 recomposes exactly from the
            #     two from-bs0 updates: bs2 = m*u1 + u2 - m*bs0.
            # Equivalence is asserted by
            # tests/test_uda_variants.py::test_merged_student_passes.
            def one_pass(im, lb, w, k):
                (losses, states), ups = model.apply(
                    {'params': params, 'batch_stats': batch_stats},
                    im, lb, w, train=True, mutable=['batch_stats'],
                    rngs={'dropout': k}, method=model.forward_train)
                return losses, states, ups['batch_stats']

            losses2, states2, ubs2 = jax.vmap(one_pass)(
                jnp.stack([img, mixed_img]),
                jnp.stack([gt, mixed_lbl]),
                jnp.stack([jnp.ones_like(pseudo_weight),
                           pseudo_weight]),
                jnp.stack([k_drop_src, k_drop_mix]))

            def take(tree, i):
                return jax.tree.map(lambda a: a[i], tree)

            clean_losses, mix_losses = take(losses2, 0), take(losses2, 1)
            clean_states, mix_states = take(states2, 0), take(states2, 1)
            new_batch_stats = jax.tree.map(
                lambda u, b0: bn_m * u[0] + u[1] - bn_m * b0,
                ubs2, batch_stats)
        else:
            # ---- source supervised pass (``pfgst.py:225-237``) -------
            (clean_losses, clean_states), updates = model.apply(
                {'params': params, 'batch_stats': batch_stats}, img, gt,
                train=True, mutable=['batch_stats'],
                rngs={'dropout': k_drop_src},
                method=model.forward_train)
            bs1 = updates['batch_stats']
            # ---- mixed-pass training (``pfgst.py:303-310``) ----------
            (mix_losses, mix_states), updates = model.apply(
                {'params': params, 'batch_stats': bs1}, mixed_img,
                mixed_lbl, pseudo_weight, train=True,
                mutable=['batch_stats'], rngs={'dropout': k_drop_mix},
                method=model.forward_train)
            new_batch_stats = updates['batch_stats']

        src_feats = clean_states['decoded_features'] \
            if self.use_decoded_feats else clean_states['features']
        src_logits = clean_states['seg_logits']
        clean_loss, clean_log = parse_losses(clean_losses)
        log_vars.update(clean_log)
        total_loss = clean_loss

        # ---- optional DACS fdist regulariser (``dacs.py:204-211``) ----
        if self.enable_fdist and imnet_params:
            fd = self.feat_dist_loss(params, imnet_params, img, gt,
                                     clean_states['features'])
            log_vars['loss_imnet_feat_dist'] = fd
            total_loss = total_loss + fd

        mixed_feats = mix_states['features']
        mixed_logits = mix_states['seg_logits']
        mix_loss, mix_log = parse_losses(
            add_prefix(mix_losses, mix_prefix))
        log_vars.update(mix_log)
        total_loss = total_loss + mix_loss * self.trg_loss_weight

        # ---- PGSTMixFeat: teacher forward on the mixed image ----------
        # (``pgst_mix_feat.py:289-295``: instead of mask-mixing feature
        # maps, the EMA model runs a second time on the mixed view and
        # those features feed the aux losses)
        if getattr(self, 'mix_feat_teacher_forward', False):
            _, ema_feats = self.teacher_forward(
                ema_params, ema_batch_stats,
                premix['mixed_img_weak'])
        # ---- PGST ema-feature mixing (``pgst.py:108-115``) -------------
        elif self.mix_ema_feat_level is not None and not \
                self.target_self_training:
            lvl = self.mix_ema_feat_level
            src_l = jax.lax.stop_gradient(
                clean_states['features'][lvl])
            ema_l = ema_feats[lvl] if isinstance(
                ema_feats, (tuple, list)) else ema_feats
            # the reference's ``one_mix`` UPSAMPLES the feature pair
            # (nearest) to the full-resolution mask and mixes there
            # (``dacs_transforms.py:129-144`` target branch via
            # ``pgst.py:277-281``) — mixing a downsampled mask at
            # feature resolution disagrees at mask boundaries, so the
            # full-res blend is kept; the aux loss later nearest-
            # resizes it back down (``pfgst_loss.py`` get_sim_feat),
            # reproducing the reference's index arithmetic exactly.
            mh, mw = mix_masks.shape[1:3]
            from ...ops import resize as _resize
            src_up = _resize(src_l, size=(mh, mw), mode='nearest')
            ema_up = _resize(ema_l, size=(mh, mw), mode='nearest')
            m = mix_masks[..., None]
            mixed_ema = m * src_up + (1.0 - m) * ema_up
            # deliberate reference parity (``pgst.py:284``):
            # ``mixed_ema_feats = [None]*feat_level + [mixed]`` — the
            # reference also drops every other teacher level here, so
            # an aux loss reading a different level fails there too.
            ema_feats = tuple(
                mixed_ema if i == lvl else None
                for i in range(lvl + 1))

        # ---- aux (PFGST) losses (``pfgst.py:312-342``) -----------------
        if self.apply_aux:
            # FMDA's tensors carry the PLAIN target view as img_trg
            # (``fmda.py:329``, vis-only consumer); PGSTTRG carries the
            # strong view (``pgst_trg.py:284``) = its training input
            img_trg = batch['target_img'] if (
                self.target_self_training and
                self.self_training_view == 'jitter_plain') else mixed_img
            tensors = dict(
                img_src=img,
                img_trg=img_trg,
                img_mixed=mixed_img,
                gt_src=gt,
                x_src=src_feats,
                x_ema=ema_feats,
                x_trg=mixed_feats,
                logits_src=src_logits,
                logits_trg=mixed_logits,
                logits_ema=ema_logits,
                mix_masks=mix_masks,
                pseudo_weight=pseudo_weight,
            )
            aux_losses: Dict[str, jnp.ndarray] = {}
            for loss_mod in self.aux_losses:
                out = loss_mod(tensors)
                if out is not None:
                    aux_losses.update(out)
            for name in list(aux_losses):
                if name.startswith('vis|'):
                    if collect_vis:
                        vis_states[name] = aux_losses[name]
                    aux_losses.pop(name)
            aux_total, aux_log = parse_losses(aux_losses)
            log_vars.update(aux_log)
            total_loss = total_loss + aux_total

        if collect_vis:
            vis_w = pseudo_weight[..., None]
            vis_lbl = jnp.where(vis_w[..., 0] > 0.0, mixed_lbl, 255)
            vis_states['vis|seg_mask_src'] = (
                img, gt, jnp.argmax(src_logits, axis=-1))
            vis_states['vis|seg_mask_mix'] = (
                mixed_img, vis_lbl, jnp.argmax(mixed_logits, axis=-1))

        aux_out = dict(log_vars=log_vars, batch_stats=new_batch_stats,
                       vis_states=vis_states)
        return total_loss, aux_out

    # ------------------------------------------------------------------
    def make_train_step(self, tx, mean, std, collect_vis: bool = False,
                        donate: bool = True,
                        axis_name: Optional[str] = None,
                        jit: bool = True,
                        split_compile: bool = False):
        """Build the fused train step: (state, batch, rng) -> (state,
        log_vars, vis).

        ``tx`` is the optax transform; ``mean``/``std`` the dataset's
        img_norm (arrays of shape (3,)).  With ``axis_name`` set the
        step is shard_map-ready: grads/log-vars/BN running stats are
        ``pmean``-reduced over the data axis (the DDP allreduce of
        ``apis/train.py:108-112`` + the log-var allreduce of
        ``base.py:205-220``, fused into the XLA program).
        """
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.asarray(std, jnp.float32)

        def step_fn(state: UDATrainState, batch, rng, premix=None):
            batch = maybe_normalize_images(batch, mean, std)
            state = self.ema_update(state, self.alpha)

            def loss_fn(params):
                return self.forward_train(
                    params, state.batch_stats, state.ema_params,
                    state.ema_batch_stats, state.step, batch, rng,
                    mean, std, collect_vis=collect_vis,
                    imnet_params=state.imnet_params, premix=premix)

            (total, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            log_vars = dict(aux['log_vars'])
            log_vars['loss'] = total
            if getattr(self, 'print_grad_magnitude', False):
                # L2 norm of the backbone grads
                # (``pfgst.py:42-52`` calc_grad_magnitude; the
                # reference prints it, here it joins the log line)
                import optax
                bb = grads.get('backbone_mod', grads)
                log_vars['grad_mag'] = optax.global_norm(bb)
            new_batch_stats = aux['batch_stats']
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                log_vars = jax.lax.pmean(log_vars, axis_name)
                new_batch_stats = jax.lax.pmean(new_batch_stats,
                                                axis_name)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params,
                                      updates)
            new_state = state.replace(
                params=new_params,
                batch_stats=new_batch_stats,
                opt_state=new_opt,
                step=state.step + 1)
            return new_state, log_vars, aux['vis_states']

        if not jit:
            return step_fn
        if not (split_compile and
                self.supports_split_compile):
            return jax.jit(step_fn,
                           donate_argnums=(0,) if donate else ())

        # Smaller XLA programs (remote compile services cap program
        # size): (1) EMA update, (2) teacher forward, (3) pseudo-label
        # + ClassMix/strong-aug, (4) student fwd+bwd + optimizer.  Two
        # extra HBM round-trips; semantics identical to the fused step.
        @jax.jit
        def teacher_jit(ema_params, ema_batch_stats, target_img):
            if target_img.dtype in (jnp.float16, jnp.uint8):
                target_img = (target_img.astype(jnp.float32) -
                              mean) / std
            return self.teacher_forward(ema_params, ema_batch_stats,
                                        target_img)

        @jax.jit
        def mix_jit(batch, rng, teacher_out):
            batch = maybe_normalize_images(batch, mean, std)
            return self.teacher_and_mix(None, None, batch, rng, mean,
                                        std, teacher_out=teacher_out)

        ema_jit = jax.jit(lambda s: self.ema_update(s, self.alpha))
        opt_jit = jax.jit(
            lambda state, batch, rng, premix: step_fn(
                state, batch, rng, premix=premix),
            donate_argnums=(0,) if donate else ())

        def split_step(state, batch, rng, _first=[True]):
            # compute the updated teacher for the premix programs; the
            # optimizer program re-derives the identical EMA update
            # internally (step_fn starts with ema_update), so the
            # original state is passed through untouched.
            import time as _time
            from ...utils.logger import get_root_logger
            log = get_root_logger().info if _first[0] else \
                (lambda *a: None)
            t0 = _time.time()
            updated = ema_jit(state)
            log(f'[split] ema program ready +{_time.time() - t0:.0f}s')
            teacher_out = teacher_jit(updated.ema_params,
                                      updated.ema_batch_stats,
                                      batch['target_img'])
            log(f'[split] teacher program ready '
                f'+{_time.time() - t0:.0f}s')
            premix = mix_jit(batch, rng, teacher_out)
            log(f'[split] mix program ready +{_time.time() - t0:.0f}s')
            out = opt_jit(state, batch, rng, premix)
            log(f'[split] opt program ready +{_time.time() - t0:.0f}s')
            _first[0] = False
            return out

        # expose the four programs for per-program profiling
        # (tools/bench_train.py --breakdown)
        split_step.programs = dict(ema=ema_jit, teacher=teacher_jit,
                                   mix=mix_jit, opt=opt_jit)
        return split_step
