"""Training API (mirror of ``rsiseg/apis/train.py:71-192``).

``train_segmentor`` is the explicit jitted train loop replacing mmcv's
``IterBasedRunner`` + hook inversion-of-control: build data, build the
algorithm (UDA wrapper or supervised trainer — both expose the same
``init_state``/``make_train_step`` orchestrator API), then iterate
``max_iters`` steps with periodic logging / eval / checkpointing.
Multi-device data parallelism is a ``shard_map`` over the ``data``
mesh (``pfst_tpu/parallel/mesh.py``).
"""
from __future__ import annotations

import logging
import os
import os.path as osp
import time
from collections.abc import Mapping
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.checkpoint import load_checkpoint, save_checkpoint
from ..core.optimizers import build_optimizers
from ..datasets import build_dataloader, build_dataset
from ..models import build_train_model
from ..models.uda.uda_decorator import UDATrainState
from ..parallel.mesh import (get_mesh, make_sharded_train_step,
                             shard_batch)
from ..utils.logger import get_root_logger, print_log
from ..utils.misc import find_latest_checkpoint
from .test import single_gpu_test


class LazyLogVars(Mapping):
    """Mapping over on-device scalar log vars that defers the
    device→host transfer until a value is actually read.

    Hooks fire every iteration (mmcv cadence) but mostly self-gate on
    their own ``interval`` without touching values; materializing
    eagerly would force a device sync per step.

    Deliberately NOT a ``dict`` subclass: CPython's ``dict(x)`` /
    ``{**x}`` / ``d.update(x)`` fast-path dict subclasses by reading
    their internal storage directly (bypassing overridden accessors),
    which would yield an empty copy before materialization. A Mapping
    goes through ``keys()``/``__getitem__`` on every copy route.
    """

    def __init__(self, dev_vars):
        self._dev = dev_vars
        self._host = None

    def _materialize(self):
        if self._host is None:
            host = jax.device_get(self._dev)
            self._host = {k: float(v) for k, v in host.items()}
        return self._host

    def __getitem__(self, k):
        return self._materialize()[k]

    def __contains__(self, k):
        return k in self._dev

    def __iter__(self):
        return iter(self._dev)

    def __len__(self):
        return len(self._dev)

    def keys(self):
        return self._dev.keys()

    def get(self, k, default=None):
        return dict.get(self._materialize(), k, default)


class BatchPrefetcher:
    """Double-buffered host pipeline (VERDICT r3 next #3).

    A daemon thread pulls batches from the loader (decode / augment /
    collate — heavy numpy/cv2 work that releases the GIL) while the
    main thread is blocked on device results, so the host pipeline
    overlaps device compute.  The reference gets the same overlap from
    torch DataLoader workers (SURVEY §3.3 loader->GPU boundary).

    WHERE the ``device_put`` happens is backend-dependent
    (``PFST_PREFETCH_PUT``):

    * ``main`` (default) — the training thread puts strictly BETWEEN
      step dispatches.  Measured on the tunneled backend
      (`artifacts/bench_train_transfer_r4.log`): a put issued while a
      program runs not only fails to overlap, it DELAYS the program
      (serial 0.399 s/iter vs concurrent-put 0.57-0.59 against a
      0.239 pure step), so strictly-alternating put+execute is the
      optimum there.
    * ``thread`` — the prefetch thread puts; on directly-attached TPU
      hosts H2D DMA overlaps execution and this hides the copy
      entirely.

    ``depth`` bounds how far the thread runs ahead (2 = classic double
    buffering; deterministic resume is unaffected because resume
    rebuilds the iterator from ``loader.set_position``).  Exceptions
    in the pipeline re-raise in the training thread.
    """

    _ERR = object()  # queue sentinel — a batch can legitimately be falsy

    def __init__(self, batch_iter, loader, put, depth: int = 2,
                 put_in_thread: Optional[bool] = None):
        import queue
        import threading
        if put_in_thread is None:
            put_in_thread = os.environ.get(
                'PFST_PREFETCH_PUT', 'main') == 'thread'
        self._iter = batch_iter
        self._loader = loader
        self._put = put
        self._put_in_thread = put_in_thread
        self._q = queue.Queue(maxsize=max(depth, 1))
        self._err = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name='pfst-prefetch', daemon=True)
        self._thread.start()

    def _run(self):
        import queue
        it = self._iter
        while not self._stop.is_set():
            try:
                try:
                    batch = next(it)
                except StopIteration:
                    it = iter(self._loader)
                    batch = next(it)
                item = self._put(batch) if self._put_in_thread \
                    else batch
            except BaseException as e:  # noqa: BLE001 — re-raised
                self._err = e
                self._q.put(self._ERR)
                return
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next(self):
        item = self._q.get()
        if item is self._ERR:
            raise self._err
        return item if self._put_in_thread else self._put(item)

    def close(self):
        self._stop.set()
        # unblock a producer waiting on a full queue
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5.0)


def init_random_seed(seed: Optional[int] = None) -> int:
    """(``apis/train.py:21-49``) — in JAX the key is deterministic per
    process; multi-host stays in sync because everyone derives the same
    key from the config seed."""
    if seed is not None:
        return seed
    return int(np.random.randint(2**31))


def set_random_seed(seed: int, deterministic: bool = False):
    np.random.seed(seed)
    import random
    random.seed(seed)


class SupervisedTrainer:
    """Source-only training with the orchestrator API of the UDA
    algorithms (forward/backward of ``EncoderDecoder.train_step``,
    ``encoder_decoder.py:127-164``)."""

    def __init__(self, model):
        self.model = model
        self.num_classes = model.num_classes

    def get_model(self):
        return self.model

    def init_state(self, rng, img_shape, tx):
        img = jnp.zeros(img_shape, jnp.float32)
        variables = jax.jit(
            lambda r, im: self.model.init({'params': r}, im,
                                          train=False))(rng, img)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        return UDATrainState(
            params=params, batch_stats=batch_stats,
            ema_params={}, ema_batch_stats={},
            opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))

    def student_variables(self, state):
        v = {'params': state.params}
        if state.batch_stats:
            v['batch_stats'] = state.batch_stats
        return v

    def make_train_step(self, tx, mean, std, collect_vis=False,
                        donate=True, axis_name=None, jit=True):
        from ..models.uda.pfgst import parse_losses
        from ..models.uda.uda_decorator import maybe_normalize_images
        model = self.model
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.asarray(std, jnp.float32)

        def step_fn(state, batch, rng):
            batch = maybe_normalize_images(batch, mean, std)
            img = batch['img']
            gt = batch['gt_semantic_seg'].astype(jnp.int32)

            def loss_fn(params):
                (losses, states), updates = model.apply(
                    {'params': params,
                     'batch_stats': state.batch_stats}, img, gt,
                    train=True, mutable=['batch_stats'],
                    rngs={'dropout': rng},
                    method=model.forward_train)
                total, log_vars = parse_losses(losses)
                return total, (log_vars, updates['batch_stats'])

            (total, (log_vars, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            log_vars = dict(log_vars)
            log_vars['loss'] = total
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                log_vars = jax.lax.pmean(log_vars, axis_name)
                new_bs = jax.lax.pmean(new_bs, axis_name)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params,
                                      updates)
            new_state = state.replace(params=new_params,
                                      batch_stats=new_bs,
                                      opt_state=new_opt,
                                      step=state.step + 1)
            return new_state, log_vars, {}

        if not jit:
            return step_fn
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _merge_loaded(dst, src, logger=None, path=''):
    """Partial-merge a restored pytree into ``dst`` (missing keys keep
    the fresh init, unexpected/shape-mismatched keys are skipped with a
    warning) — the mmcv ``load_checkpoint(strict=False)`` role."""
    out = dict(dst)
    for k, v in (src or {}).items():
        here = f'{path}/{k}'
        if k not in dst:
            print_log(f'load_from: unexpected key {here} (skipped)',
                      logger)
            continue
        if isinstance(dst[k], dict) and isinstance(v, dict):
            out[k] = _merge_loaded(dst[k], v, logger, here)
            continue
        arr = jnp.asarray(v)
        if arr.shape != jnp.shape(dst[k]):
            print_log(
                f'load_from: shape mismatch at {here} '
                f'{arr.shape} vs {jnp.shape(dst[k])} (skipped)', logger)
            continue
        out[k] = arr.astype(jnp.asarray(dst[k]).dtype)
    return out


def load_weights_into_state(state, restored, logger=None):
    """Warm-start ``state`` from a checkpoint WITHOUT touching the
    optimizer state or step counter (the ``--load-from`` semantics;
    ``resume_from`` restores everything instead).

    The teacher (``ema_*``) and the frozen fdist reference
    (``imnet_params``) are refreshed from the loaded student so DACS'
    feature-distance regulariser compares against the *pretrained*
    init, like the reference's frozen ImageNet model
    (``dacs.py:151-161``), not a random one.
    """
    if hasattr(restored, 'params'):
        src_params = restored.params
        src_bs = getattr(restored, 'batch_stats', {})
    elif isinstance(restored, dict) and 'params' in restored:
        src_params = restored['params']
        src_bs = restored.get('batch_stats', {})
    else:
        raise ValueError(
            'unrecognised checkpoint structure for load_from '
            '(want a train state or {"params": ...} tree)')
    new_params = _merge_loaded(state.params, src_params, logger)
    new_bs = _merge_loaded(state.batch_stats, src_bs, logger) \
        if state.batch_stats else state.batch_stats
    copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
    updates = dict(params=new_params, batch_stats=new_bs)
    if getattr(state, 'ema_params', None):
        updates['ema_params'] = copy(new_params)
        updates['ema_batch_stats'] = copy(new_bs)
    if getattr(state, 'imnet_params', None):
        updates['imnet_params'] = copy(new_params)
    return state.replace(**updates)


def _img_norm_from_pipeline(cfg) -> Dict[str, Any]:
    """Find the Normalize/ClipNormalize mean/std of the train pipeline."""

    def search(pipeline):
        for t in pipeline or []:
            if t.get('type') in ('Normalize', 'DeferNormalize',
                                 'ClipNormalize'):
                return dict(mean=list(t['mean']), std=list(t['std']))
        return None

    train = cfg.data['train']
    for sub in ('source', None):
        node = train.get(sub) if sub else train
        if node is None:
            continue
        found = search(node.get('pipeline'))
        if found:
            return found
    return dict(mean=[0.0, 0.0, 0.0], std=[1.0, 1.0, 1.0])


def apply_device_normalize(cfg):
    """``cfg.data.device_normalize`` (True or 'float16'/'uint8'):
    swap every train-pipeline ``Normalize`` for ``DeferNormalize`` so
    images cross the host->device link half- (or quarter-) width and
    are normalized inside the jitted step — the link is the train-loop
    bottleneck on tunneled/thin-PCIe hosts (PERF.md).

    Refuses pipelines whose ``Pad`` size differs from the crop size:
    a real pad would land at -mean/std after device normalization
    instead of the reference's 0-in-normalized-space."""
    opt = cfg.data.get('device_normalize')
    if not opt:
        return cfg
    wire = opt if isinstance(opt, str) else 'float16'

    def walk(node):
        if isinstance(node, dict):
            pipeline = node.get('pipeline')
            if isinstance(pipeline, (list, tuple)):
                crop = None
                for t in pipeline:
                    if t.get('type') == 'RandomCrop':
                        crop = tuple(t.get('crop_size') or ())
                for t in pipeline:
                    if t.get('type') == 'Pad':
                        size = tuple(t.get('size') or ())
                        if crop is not None and size and size != crop:
                            raise ValueError(
                                'device_normalize needs Pad size == '
                                f'crop size, got {size} vs {crop}')
                for t in pipeline:
                    if t.get('type') == 'Normalize':
                        t['type'] = 'DeferNormalize'
                        t['wire_dtype'] = wire
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(cfg.data['train'])
    return cfg


def build_algorithm(cfg):
    """UDA wrapper or supervised trainer, both orchestrator-shaped."""
    model_or_algo = build_train_model(cfg)
    if hasattr(model_or_algo, 'make_train_step'):
        return model_or_algo
    return SupervisedTrainer(model_or_algo)


def train_segmentor(cfg,
                    work_dir: Optional[str] = None,
                    resume_from: Optional[str] = None,
                    load_from: Optional[str] = None,
                    auto_resume: bool = False,
                    validate: bool = True,
                    seed: int = 0,
                    meta: Optional[Dict] = None,
                    max_iters_override: Optional[int] = None,
                    eval_fn=None):
    """The explicit train loop (replaces IterBasedRunner.run)."""
    if work_dir:
        os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(
        osp.join(work_dir, 'train.log') if work_dir else None)
    set_random_seed(seed)

    apply_device_normalize(cfg)
    if cfg.data.get('decode_cache_mb'):
        from ..datasets.pipelines.loading import set_decode_cache_mb
        set_decode_cache_mb(float(cfg.data['decode_cache_mb']))
    train_ds = build_dataset(cfg.data['train'])
    samples_per_gpu = cfg.data.get('samples_per_gpu', 2)
    workers_per_gpu = cfg.data.get('workers_per_gpu', 2)
    n_dev = jax.local_device_count()
    # optional tensor parallelism: cfg.parallel.tp devices shard the
    # transformer block weights (Megatron layout, parallel/tp.py); the
    # remaining n_dev // tp devices form the data axis
    par_cfg = cfg.get('parallel') or {}
    tp_size = int(par_cfg.get('tp', 1))
    # ZeRO optimizer-state sharding (parallel/zero.py): partitions the
    # AdamW moments over the data axis instead of replicating them.
    # cfg.parallel.zero: True/1 = ZeRO-1 (moments only), 3 = ZeRO-3 /
    # FSDP (also partitions the param + EMA-teacher trees)
    zero_level = int(par_cfg.get('zero', 0) or 0)
    zero_on = zero_level > 0
    if zero_on:
        zero_level = 3 if zero_level >= 3 else 1
    if tp_size > 1:
        assert n_dev % tp_size == 0, \
            f'{n_dev} devices not divisible by parallel.tp={tp_size}'
    # spatial partitioning of the training crop (parallel/spatial.py):
    # cfg.parallel.sp devices shard the crop's H axis (GSPMD halo
    # exchange), optionally × parallel.spw on the W axis (2-D grid);
    # the rest form the data axis — trains crops sp× taller (spw×
    # wider) than one chip's HBM allows, exactly (global sync-BN
    # semantics)
    sp_size = int(par_cfg.get('sp', 1))
    spw_size = int(par_cfg.get('spw', 1))
    if sp_size > 1 or spw_size > 1:
        assert tp_size == 1 and not zero_on, \
            'parallel.sp composes with dp only (not tp/zero)'
        assert n_dev % (sp_size * spw_size) == 0, \
            f'{n_dev} devices not divisible by parallel.sp=' \
            f'{sp_size}x spw={spw_size}'
    n_data = n_dev // (tp_size * sp_size * spw_size)
    loader = build_dataloader(train_ds, samples_per_gpu * n_data,
                              workers_per_gpu, shuffle=True, seed=seed,
                              drop_last=True, infinite=True,
                              rank=jax.process_index(),
                              world_size=jax.process_count(),
                              use_processes=cfg.data.get(
                                  'use_processes'))

    max_iters = max_iters_override or cfg.runner['max_iters']
    algo = build_algorithm(cfg)
    opt_cfg = dict(cfg.get('optimizer_config') or {})
    # dict-of-optimizers configs (no 'type' key; e.g. the adversarial
    # DomainAdaptorAdv's generator/discriminator pair, reference
    # ``core/builder.py:36-90`` + mmcv's dict-optimizer runner) yield
    # a dict of transforms that the algo's init_state/make_train_step
    # consume directly
    tx = build_optimizers(dict(cfg.optimizer), cfg.get('lr_config'),
                          max_iters, opt_cfg.get('grad_clip'),
                          opt_cfg.get('cumulative_iters', 1),
                          opt_cfg.get('skip_nonfinite', 0))
    if isinstance(tx, dict) and zero_on:
        raise ValueError('parallel.zero does not compose with a '
                         'dict-of-optimizers config')
    norm = _img_norm_from_pipeline(cfg)

    batch_iter = iter(loader)
    first = next(batch_iter)
    # MultiDomainDataset batches carry dom1_/dom2_ prefixed keys
    img_shape = first['img' if 'img' in first else 'dom1_img'].shape

    rng = jax.random.PRNGKey(seed)
    init_rng, rng = jax.random.split(rng)
    # init at a small spatial size: parameter shapes are H/W-independent
    # for every registered model, and init traces a full forward — at
    # 512^2 that is a multi-minute compile for zeros we throw away
    init_h = min(64, img_shape[1])
    init_w = min(64, img_shape[2])
    print_log('initializing model state...', logger)
    state = algo.init_state(init_rng, (1, init_h, init_w,
                                       img_shape[3]), tx)
    jax.block_until_ready(state.params)
    print_log('model state initialized', logger)

    start_iter = 0
    if resume_from is None and auto_resume and work_dir:
        resume_from = find_latest_checkpoint(work_dir)
    if resume_from:
        state = load_checkpoint(resume_from, target=state)
        start_iter = int(state.step)
        print_log(f'resumed from {resume_from} @ iter {start_iter}',
                  logger)
        if start_iter > 0:
            # deterministic data resume: position the seeded stream at
            # the batch this iteration consumes in an uninterrupted
            # run (the reference replays each epoch from its start)
            loader.set_position(start_iter)
            batch_iter = iter(loader)
            first = next(batch_iter)
    else:
        load_from = load_from or cfg.get('load_from')
        if not load_from:
            # mmseg ``pretrained='<local path>'`` behaves as a
            # weights-only warm start too (converted checkpoints)
            p = (cfg.model or {}).get('pretrained')
            if isinstance(p, str) and osp.exists(osp.expanduser(p)):
                load_from = p
        if load_from:
            state = load_weights_into_state(
                state, load_checkpoint(load_from), logger)
            print_log(f'loaded weights from {load_from} '
                      '(optimizer/step fresh)', logger)

    log_interval = (cfg.get('log_config') or {}).get('interval', 50)
    ckpt_interval = (cfg.get('checkpoint_config') or {}).get(
        'interval', 4000)
    ckpt_async = bool((cfg.get('checkpoint_config') or {}).get(
        'async_save', False))
    eval_cfg = cfg.get('evaluation') or {}
    eval_interval = eval_cfg.get('interval', 4000)

    # custom hooks (log_config hooks + cfg.custom_hooks), reference
    # ``apis/train.py:138-182``
    from ..core.hooks import build_hook
    hook_cfgs = list((cfg.get('log_config') or {}).get('hooks') or [])
    hook_cfgs += list(cfg.get('custom_hooks') or [])
    hooks = []
    for hc in hook_cfgs:
        try:
            hooks.append(build_hook(hc))
        except KeyError as e:
            print_log(f'skipping unknown hook {hc}: {e}', logger)
    ctx = {
        'work_dir': work_dir,
        'iter': 0,
        'algo': algo,
        'palette': getattr(train_ds, 'PALETTE', None),
        'source_dataset': getattr(train_ds, 'source', train_ds),
        'cfg': cfg,
    }
    collect_vis = any(
        type(h).__name__ in ('WandbHookSeg', 'PlotStatisticsHook',
                             'PlotMultiClassStatisticsHook')
        for h in hooks)
    for h in hooks:
        h.before_run(ctx)

    if tp_size > 1:
        from ..parallel import tp as tp_mod
        mesh2 = tp_mod.get_2d_mesh(n_model=tp_size)
        if zero_on:
            from ..parallel import zero as zero_mod
            state = zero_mod.shard_state(
                state, mesh2, tp_rules=tp_mod.DEFAULT_TP_RULES,
                level=zero_level)
            step_fn = zero_mod.make_zero_train_step(
                algo, tx, norm['mean'], norm['std'], mesh2,
                tp_rules=tp_mod.DEFAULT_TP_RULES,
                collect_vis=collect_vis, level=zero_level)
        else:
            state = tp_mod.shard_state(state, mesh2)
            step_fn = tp_mod.make_tp_train_step(
                algo, tx, norm['mean'], norm['std'], mesh2,
                collect_vis=collect_vis)
        put = lambda b: tp_mod.shard_batch_2d(  # noqa: E731
            {k: v for k, v in b.items() if isinstance(v, np.ndarray)},
            mesh2)
    elif sp_size > 1 or spw_size > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel import spatial as sp_mod
        mesh_sp = sp_mod.get_spatial_mesh(sp_size, spw_size)
        state = jax.device_put(state,
                               NamedSharding(mesh_sp, PartitionSpec()))
        step_fn = sp_mod.make_spatial_train_step(
            algo, tx, norm['mean'], norm['std'], mesh_sp,
            collect_vis=collect_vis)
        put = lambda b: sp_mod.shard_spatial_batch(  # noqa: E731
            {k: v for k, v in b.items() if isinstance(v, np.ndarray)},
            mesh_sp)
    elif n_dev > 1 and zero_on:
        from ..parallel import zero as zero_mod
        mesh = get_mesh()
        state = zero_mod.shard_state(state, mesh, level=zero_level)
        step_fn = zero_mod.make_zero_train_step(
            algo, tx, norm['mean'], norm['std'], mesh,
            collect_vis=collect_vis, level=zero_level)
        put = lambda b: zero_mod.shard_batch(  # noqa: E731
            {k: v for k, v in b.items() if isinstance(v, np.ndarray)},
            mesh)
    elif n_dev > 1:
        mesh = get_mesh()
        step_fn = make_sharded_train_step(algo, tx, norm['mean'],
                                          norm['std'], mesh,
                                          collect_vis=collect_vis)
        put = lambda b: shard_batch(  # noqa: E731
            {k: v for k, v in b.items() if isinstance(v, np.ndarray)},
            mesh)
    else:
        try:
            # UDA steps split into four XLA programs by default:
            # remote-compile services cap program size and the fused
            # 512^2 step can exceed it (see PERF.md). cfg
            # ``split_compile=False`` opts into the single fused
            # program on healthy toolchains.
            step_fn = algo.make_train_step(
                tx, norm['mean'], norm['std'],
                collect_vis=collect_vis,
                split_compile=cfg.get('split_compile', True))
        except TypeError:
            step_fn = algo.make_train_step(tx, norm['mean'],
                                           norm['std'],
                                           collect_vis=collect_vis)
        # Transfer mode (round-3 re-measurement, PERF.md "Data
        # loading"): on the current toolchain an explicit
        # jax.device_put moves batches at ~430 MB/s while passing
        # numpy as execute arguments crawls at ~40-60 MB/s — the
        # REVERSE of the round-2 measurement, and the difference was
        # the whole training-throughput mystery. device_put is the
        # default; PFST_TRANSFER=execute_arg restores the old path for
        # toolchains where it wins. The put happens right after the
        # step dispatch so the copy overlaps device compute.
        # With device_normalize on, labels also travel as uint8 (the
        # ignore index 255 and any num_classes <= 255 fit).
        compress_gt = bool(cfg.data.get('device_normalize'))
        use_device_put = os.environ.get(
            'PFST_TRANSFER', 'device_put') != 'execute_arg'

        def put(b):
            out = {}
            for k, v in b.items():
                if not isinstance(v, np.ndarray):
                    continue
                if compress_gt and 'seg' in k and \
                        v.dtype in (np.int32, np.int64):
                    v = v.astype(np.uint8)
                out[k] = v
            return jax.device_put(out) if use_device_put else out

    # Preemption safety (beyond the reference, which dies mid-step and
    # loses up to ckpt_interval iterations): SIGTERM / SIGUSR1 — the
    # eviction notices TPU pods get — request a checkpoint + clean exit
    # at the next iteration boundary.  Handlers only install in the
    # main thread (signal.signal raises elsewhere, e.g. under pytest
    # workers).
    preempt = {'sig': None}
    _old_handlers = {}
    if work_dir:
        import signal
        import threading
        if threading.current_thread() is threading.main_thread():
            def _on_preempt(sig, frame):
                preempt['sig'] = sig

            for s in (signal.SIGTERM, signal.SIGUSR1):
                _old_handlers[s] = signal.signal(s, _on_preempt)


    def ckpt_view(s):
        # single process: host snapshot (decouples from donation).
        # multi-process: hand Orbax the GLOBAL jax arrays — every
        # process calls save collectively and writes only its own
        # addressable shards (required for ZeRO-3; a host copy of a
        # non-fully-addressable array would throw anyway)
        return s if jax.process_count() > 1 else jax.device_get(s)

    print_log('entering train loop (first step compiles)...', logger)
    # diagnostic: PFST_REPEAT_FIRST_BATCH=1 trains on the first batch
    # forever, removing ALL per-iter data-pipeline work — on a 1-core
    # host the producer thread competes with dispatch for the CPU, so
    # comparing s/iter with/without this isolates that contention
    # (see PERF.md "train-loop vs pure-step gap")
    repeat_first = os.environ.get('PFST_REPEAT_FIRST_BATCH') == '1'
    device_batch = put(first)
    t_data = 0.0
    # double-buffered prefetch: loader + device_put on a background
    # thread overlap the device wait (PFST_PREFETCH=0 restores the
    # serial fetch; depth via PFST_PREFETCH=N)
    prefetch_depth = int(os.environ.get('PFST_PREFETCH', '2') or 0)
    prefetcher = None
    if prefetch_depth > 0 and not repeat_first:
        prefetcher = BatchPrefetcher(batch_iter, loader, put,
                                     depth=prefetch_depth)
    # quantization-aware fine-tuning: cfg.qat fake-quants every conv/
    # dense during the step's trace (ops/quant.py:qat_training) so the
    # trained weights deploy through tools/test.py --quant-int8
    from ..ops.quant import qat_context_from_cfg
    qat_ctx = qat_context_from_cfg(cfg)
    t_last = time.time()
    try:
        for it in range(start_iter, max_iters):
            step_rng = jax.random.fold_in(rng, it)
            with qat_ctx():
                state, log_vars, vis_states = step_fn(state, device_batch,
                                                      step_rng)
            ctx['iter'] = it + 1
            ctx['state'] = state
            if prefetcher is not None:
                # data time = residual stall only: how long the loop
                # actually waited for a batch that wasn't ready
                t0 = time.time()
                device_batch = prefetcher.next()
                t_data += time.time() - t0
            elif not repeat_first:
                t0 = time.time()
                try:
                    nxt = next(batch_iter)
                except StopIteration:
                    batch_iter = iter(loader)
                    nxt = next(batch_iter)
                device_batch = put(nxt)
                t_data += time.time() - t0

            lazy_vars = LazyLogVars(log_vars)
            if (it + 1) % log_interval == 0:
                # materialize BEFORE reading the clock: fetching the log
                # vars blocks on all queued device work, and that wait
                # belongs to this window (otherwise a dispatch-only time
                # is reported — observed 0.02 "s/iter" while wall
                # timestamps said 0.2)
                msg = ', '.join(f'{k}: {float(v):.4f}'
                                for k, v in sorted(lazy_vars.items()))
                dt = time.time() - t_last
                print_log(
                    f'Iter [{it + 1}/{max_iters}] '
                    f'time: {dt / log_interval:.3f}s '
                    f'data: {t_data / log_interval:.3f}s  {msg}', logger)
                t_last, t_data = time.time(), 0.0
                bad = [k for k, v in lazy_vars.items()
                       if not np.isfinite(float(v))]
                if bad:
                    # loud, every log interval — a silent NaN destroys the
                    # checkpoint; optimizer_config.skip_nonfinite=N makes
                    # the optimizer drop such updates instead
                    print_log(
                        f'NON-FINITE loss values at iter {it + 1}: '
                        f'{bad} — set optimizer_config.skip_nonfinite to '
                        'drop bad updates', logger, level=logging.WARNING)
            # hooks fire EVERY iteration (mmcv cadence) and self-gate on
            # their own intervals; log-var transfer stays lazy off-interval
            try:
                for h in hooks:
                    h.after_train_iter(ctx, lazy_vars,
                                       vis_states if collect_vis else None)
            except ValueError as e:
                # deliberate halt (PseudoLabelingHook*: the reference
                # stops training the same way after dumping the corpus)
                print_log(f'training halted by hook: {e}', logger)
                break

            # Preemption exit.  Multi-process worlds must AGREE on the
            # stop iteration (the save below is a collective Orbax write;
            # eviction signals can land one iteration apart per host), so
            # they vote by allgather on the log cadence; single-process
            # stops immediately.
            stop_now = preempt['sig'] is not None
            if work_dir and jax.process_count() > 1:
                if (it + 1) % log_interval == 0:
                    from jax.experimental import multihost_utils
                    votes = multihost_utils.process_allgather(
                        np.array([1 if stop_now else 0], np.int32))
                    stop_now = int(np.sum(votes)) > 0
                else:
                    stop_now = False
            if work_dir and stop_now:
                save_checkpoint(work_dir, it + 1, ckpt_view(state),
                                meta=meta)
                print_log('preemption signal '
                          f'{preempt["sig"] or "(peer vote)"}: '
                          f'checkpoint saved @ iter {it + 1}, exiting '
                          '(auto_resume continues from here)', logger)
                break

            if work_dir and (it + 1) % ckpt_interval == 0:
                # async_save hands device arrays straight to Orbax (one
                # host snapshot, disk IO on a background thread) so the
                # loop keeps stepping while the checkpoint commits
                save_checkpoint(work_dir, it + 1,
                                state if ckpt_async else
                                ckpt_view(state),
                                meta=meta, async_save=ckpt_async)
                print_log(f'checkpoint saved @ iter {it + 1}'
                          + (' (async)' if ckpt_async else ''), logger)

            if validate and (it + 1) % eval_interval == 0:
                metrics = evaluate_during_train(cfg, algo, state, eval_cfg,
                                                logger, eval_fn)
                for h in hooks:
                    h.after_eval(ctx, metrics or {})
                # save-best tracking (EvalHook greater_keys=['mIoU','mAcc',
                # 'aAcc'], ``eval_hooks.py:45-58``)
                save_best = eval_cfg.get('save_best')
                if work_dir and save_best and metrics and \
                        save_best in metrics:
                    best = ctx.get('best_score', -1.0)
                    if metrics[save_best] > best:
                        ctx['best_score'] = metrics[save_best]
                        save_checkpoint(
                            osp.join(work_dir, 'best'), it + 1,
                            ckpt_view(state), meta=meta)
                        print_log(
                            f'new best {save_best}='
                            f'{metrics[save_best]:.4f} @ iter {it + 1}',
                            logger)
    finally:
        # the daemon prefetch thread must not outlive the loop —
        # an exception in step_fn/hooks/checkpointing would leave
        # it pulling loader batches concurrently with later work
        if prefetcher is not None:
            prefetcher.close()
    if work_dir and preempt['sig'] is None and \
            (max_iters % ckpt_interval != 0
             or int(state.step) != max_iters):
        # the interval save already wrote this exact step otherwise
        # (and the preemption path wrote its own)
        save_checkpoint(work_dir, max_iters, ckpt_view(state),
                        meta=meta)
    if _old_handlers:
        import signal
        for s, h in _old_handlers.items():
            signal.signal(s, h)
    if ckpt_async:
        from ..core.checkpoint import wait_for_pending
        wait_for_pending()
    for h in hooks:
        h.after_run(ctx)
    return state


_VAL_CACHE: dict = {}


def evaluate_during_train(cfg, algo, state, eval_cfg, logger,
                          eval_fn=None):
    """(Dist)EvalHook equivalent (``eval_hooks.py:45-133``)."""
    if eval_fn is not None:
        return eval_fn(algo, state)
    # build the val dataset/loader once per cfg, not per interval
    # (every 4k iters the reference reuses its loader too)
    cached = _VAL_CACHE.get(id(cfg))
    if cached is None:
        val_cfg = {**cfg.data['val'], 'test_mode': True}
        wire = cfg.data.get('device_normalize_eval')
        if wire:
            # opt-in narrow wire for the in-train eval sweeps (the
            # train batches already default to it): swap Normalize ->
            # DeferNormalize; single_gpu_test detects the deferred
            # metas and normalizes on device. Kept opt-in because the
            # reference-parity eval contract is host-side float32.
            import copy as _copy

            from ..datasets.pipelines import DeferNormalize
            val_cfg = _copy.deepcopy(val_cfg)
            DeferNormalize.swap_into(
                val_cfg.get('pipeline'),
                wire if isinstance(wire, str) else 'uint8')
        val_ds = build_dataset(val_cfg)
        loader = build_dataloader(val_ds, 1, 1, shuffle=False)
        _VAL_CACHE.clear()  # one live training run at a time
        _VAL_CACHE[id(cfg)] = (val_ds, loader)
    else:
        val_ds, loader = cached
    model = algo.get_model()
    variables = algo.student_variables(state)
    # evaluation = dict(quant_int8=True): score the DEPLOYED int8
    # program mid-training (the natural companion of cfg.qat)
    extra = {}
    if eval_cfg.get('quant_int8'):
        extra = dict(quant_int8=True,
                     act_scales=eval_cfg.get('act_scales'))
    if jax.local_device_count() > 1:
        from .test import multi_gpu_test
        results = multi_gpu_test(model, variables, loader,
                                 pre_eval=True, **extra)
    else:
        results = single_gpu_test(model, variables, loader,
                                  pre_eval=True, **extra)
    metric = eval_cfg.get('metric', 'mIoU')
    res = val_ds.evaluate(results, metric=metric, logger=logger)
    return res
