#!/usr/bin/env python
"""Train-step benchmark: the full PFGST UDA iteration, honestly timed.

Measures the SUSTAINED s/iter of the shipped Pots->Vaih leaf config's
training step (EMA update + teacher forward + pseudo-labels + ClassMix
/ jitter / blur + two student fwd+bwd passes + PFGST aux losses +
AdamW) — the per-iteration footprint of the reference
``rsiseg/models/uda/pfgst.py:129-166`` (2x student fwd+bwd + 1x
teacher fwd, SURVEY §3.1).

Protocol (tunneled-TPU safe, see PERF.md "Measurement protocol"):
  * fresh random batches EVERY step (identical executions can be
    elided by the backend);
  * the state chain serializes steps on device (step i+1 consumes
    step i's donated state), so enqueue N steps and block once at the
    end — wall/N is the true sustained rate, immune to async-dispatch
    transients (a 20-iter run whose queue drain lands in an untimed
    checkpoint save under-reports by up to 4x; that was the round-2
    0.32 s/iter artifact — see PERF.md);
  * force materialization via np.asarray of the final loss AND one
    param/opt leaf (block_until_ready does not reliably block here).

Usage:
  python bench_train.py                      # batch 2, bf16+fp32
  python bench_train.py --batch 8 --dtype bf16
  python bench_train.py --breakdown          # per-program times
  python bench_train.py --no-aux             # ablate PFGST losses
"""
import argparse
import json
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0
V5E_FP32_PEAK_TFLOPS = 24.6  # v5e has no fp32 matmul units beyond
#                              MXU passes; ~1/8 of bf16 peak


def make_batch(rs, b, size, wire=None):
    """wire=None: host-normalized float32 (the classic path).
    wire='uint8': the ``device_normalize`` shipping path — 0-255
    uint8 images + uint8 labels, normalized inside the jitted step
    (``uda_decorator.maybe_normalize_images``); 4x fewer wire bytes."""
    if wire == 'uint8':
        return {
            'img': rs.randint(0, 256, (b, size, size, 3)).astype(
                np.uint8),
            'gt_semantic_seg': rs.randint(0, 6, (b, size, size)).astype(
                np.uint8),
            'target_img': rs.randint(
                0, 256, (b, size, size, 3)).astype(np.uint8),
            'target_img_strong_aug': rs.randint(
                0, 256, (b, size, size, 3)).astype(np.uint8),
        }
    return {
        'img': rs.randn(b, size, size, 3).astype(np.float32),
        'gt_semantic_seg': rs.randint(0, 6, (b, size, size)).astype(
            np.int32),
        'target_img': rs.randn(b, size, size, 3).astype(np.float32),
        'target_img_strong_aug': rs.randn(b, size, size, 3).astype(
            np.float32),
    }


def build(batch_size, size, dtype, no_aux=False, no_strongaug=False,
          split=True, fused=False, with_cp=False, no_merge=False,
          flat_opt=False):
    import jax
    import optax

    from pfst_tpu.models import build_train_model
    from pfst_tpu.utils.config import Config

    cfg = Config.fromfile(
        'configs/pfst/pfst_pots_irrg2vaih_irrg_deeplabv3plus_r50-d8.py')
    uda = dict(cfg['uda'])
    model_cfg = dict(cfg['model'])
    if dtype == 'bf16':
        model_cfg['dtype'] = 'bfloat16'
    if with_cp:                   # per-block remat: fits batch>=16
        model_cfg['backbone'] = dict(model_cfg['backbone'],
                                     with_cp=True)
    if no_aux:
        uda['aux_losses'] = []
    if no_strongaug:
        uda['blur'] = False
        uda['color_jitter_probability'] = 0.0
    if no_merge:                  # A/B: sequential two-pass student
        uda['merge_student_passes'] = False
    algo = build_train_model(dict(uda=uda, model=model_cfg,
                                  runner=dict(max_iters=40000)))
    tx = optax.adamw(6e-5, b1=0.9, b2=0.999, weight_decay=0.01)
    if flat_opt:
        # A/B: run the optimizer on ONE flattened vector — collapses
        # the ~10-ops-per-leaf AdamW tree update (~300 leaves) into a
        # handful of fused vector ops (dispatch-floor lever, see
        # artifacts/roofline_r4.log)
        tx = optax.flatten(tx)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3), tx)
    step = algo.make_train_step(
        tx, mean=[123.675, 116.28, 103.53],
        std=[58.395, 57.12, 57.375],
        split_compile=(split and not fused))
    return algo, state, step


def program_flops(step, state, batch, rng):
    """Compiler-counted FLOPs summed over the split programs (or the
    one fused program).  Returns nan where the toolchain can't say."""
    import jax

    progs = getattr(step, 'programs', None)
    try:
        if progs is None:
            cost = step.lower(state, batch, rng).compile() \
                .cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            return float(cost.get('flops', float('nan')))
        total = 0.0
        ema = progs['ema'].lower(state).compile().cost_analysis()
        teacher_args = (state.ema_params, state.ema_batch_stats,
                        batch['target_img'])
        tea = progs['teacher'].lower(*teacher_args).compile()
        teacher_out = jax.eval_shape(
            lambda *a: progs['teacher'](*a), *teacher_args)
        mix = progs['mix'].lower(batch, rng, teacher_out).compile()
        premix = jax.eval_shape(lambda b, r, t: progs['mix'](b, r, t),
                                batch, rng, teacher_out)
        opt = progs['opt'].lower(state, batch, rng, premix).compile()
        for c in (ema, tea.cost_analysis(), mix.cost_analysis(),
                  opt.cost_analysis()):
            cc = c.cost_analysis() if hasattr(c, 'cost_analysis') else c
            if isinstance(cc, list):
                cc = cc[0]
            total += float(cc.get('flops', 0.0))
        return total
    except Exception as e:  # cost analysis is best-effort
        print(f'# cost_analysis unavailable: {type(e).__name__}: {e}')
        return float('nan')


def put_batches(batches):
    """Pre-transfer batches to device (control for the tunnel's
    host->device bandwidth: with resident inputs the chain times pure
    device compute)."""
    import jax
    out = [jax.device_put(b) for b in batches]
    jax.block_until_ready(out)
    return out


def timed_chain(step, state, batches, rngs, device_put=True,
                max_inflight=None, transfer='inline'):
    """Enqueue len(batches) steps chained through the donated state,
    block once, return (wall_seconds, final_state).

    ``device_put`` mirrors the train loop's transfer mode (explicit
    device_put, ~430 MB/s on this toolchain vs ~40-60 MB/s for numpy
    execute-arguments — see PERF.md); the put is timed (it happens
    inside the loop, like training).

    ``transfer`` selects how host batches reach the device:
      * 'inline'   — put batch i+1 on the main thread right after
                     dispatching step i (overlaps only if device_put
                     returns before the copy completes);
      * 'serial'   — put strictly before each dispatch (no overlap
                     attempt; the round-2/3 loop shape);
      * 'prefetch' — a background thread device_puts ahead through a
                     depth-2 queue (the apis/train.py BatchPrefetcher
                     shape: overlap bounded only by the tunnel's
                     ability to copy while a program runs).

    ``max_inflight`` bounds the async dispatch queue: every queued
    step pins its input batch in HBM, so an unbounded chain holds
    len(batches) x batch_bytes of inputs that the real train loop
    (which stays <= 2 batches ahead) never does — at batch 16 that is
    ~1.8 GB and OOMs before the step itself would.  Blocking on the
    scalar loss of step i - max_inflight costs one tiny tunnel
    round-trip against a multi-second step."""
    import jax

    fetch = None
    if transfer == 'prefetch' and device_put and isinstance(
            next(iter(batches[0].values())), np.ndarray):
        import queue
        import threading
        q = queue.Queue(maxsize=2)
        err_sentinel = object()
        prod_err = []

        def producer():
            try:
                for b in batches:
                    q.put(jax.device_put(b))
            except BaseException as e:  # noqa: BLE001 — re-raised
                prod_err.append(e)
                q.put(err_sentinel)

        threading.Thread(target=producer, daemon=True).start()

        def fetch(i):
            item = q.get()
            if item is err_sentinel:
                raise prod_err[0]
            return item

    t0 = time.perf_counter()
    pending = []
    log_vars = None
    nxt = None
    for i, (b, r) in enumerate(zip(batches, rngs)):
        host_batch = isinstance(next(iter(b.values())), np.ndarray)
        if fetch is not None:
            b = fetch(i)
        elif device_put and host_batch:
            if transfer == 'serial' or nxt is None:
                b = jax.device_put(b)
            else:
                b = nxt
        state, log_vars, _ = step(state, b, r)
        if fetch is None and transfer == 'inline' and device_put \
                and i + 1 < len(batches) and isinstance(
                    next(iter(batches[i + 1].values())), np.ndarray):
            nxt = jax.device_put(batches[i + 1])
        if max_inflight:
            pending.append(log_vars['loss'])
            if len(pending) > max_inflight:
                _ = np.asarray(pending.pop(0))
    loss = np.asarray(log_vars['loss'])
    leaf = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0].ravel()[:1])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), f'non-finite loss {loss}'
    assert np.isfinite(leaf).all()
    return dt, state


def run_one(batch_size, dtype, size, steps, reps, warmup, args):
    import jax

    algo, state, step = build(batch_size, size, dtype,
                              no_aux=args.no_aux,
                              no_strongaug=args.no_strongaug,
                              fused=args.fused,
                              with_cp=getattr(args, 'with_cp', False),
                              no_merge=getattr(args, 'no_merge',
                                               False),
                              flat_opt=getattr(args, 'flat_opt',
                                               False))
    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(42)
    t0 = time.perf_counter()
    for i in range(warmup):
        b = make_batch(rs, batch_size, size)
        state, lv, _ = step(state, b, jax.random.fold_in(rng, 1000 + i))
    _ = np.asarray(lv['loss'])
    print(f'# warmup+compile {time.perf_counter() - t0:.0f}s '
          f'(batch {batch_size}, {dtype})')

    best = None
    for rep in range(reps):
        batches = [make_batch(rs, batch_size, size)
                   for _ in range(steps)]
        if getattr(args, 'device_inputs', False):
            batches = put_batches(batches)
        rngs = [jax.random.fold_in(rng, rep * steps + i)
                for i in range(steps)]
        dt, state = timed_chain(step, state, batches, rngs,
                                max_inflight=args.max_inflight,
                                transfer=getattr(args, 'transfer_mode',
                                                 'inline'))
        per_iter = dt / steps
        print(f'# rep {rep}: {per_iter:.3f} s/iter '
              f'({batch_size / per_iter:.1f} img/s)')
        best = per_iter if best is None else min(best, per_iter)

    flops = float('nan')
    if args.flops:
        b = make_batch(rs, batch_size, size)
        flops = program_flops(step, state, b, rng)
    rec = {
        'metric': 'PFGST UDA train step 512^2',
        'batch': batch_size,
        'dtype': dtype,
        's_per_iter': round(best, 4),
        'img_per_sec': round(batch_size / best, 2),
        'unit': 's/iter',
        'transfer': ('device-resident'
                     if getattr(args, 'device_inputs', False)
                     else getattr(args, 'transfer_mode', 'inline')),
    }
    if np.isfinite(flops):
        achieved = flops / best / 1e12
        peak = (V5E_BF16_PEAK_TFLOPS if dtype == 'bf16'
                else V5E_FP32_PEAK_TFLOPS)
        rec['program_gflop'] = round(flops / 1e9, 1)
        rec['achieved_tflops'] = round(achieved, 2)
        rec['mfu_pct'] = round(100 * achieved / peak, 1)
    print(json.dumps(rec))
    return rec


def run_mode(mode, batch_size, dtype, size, steps, reps, warmup):
    """Isolated pieces of the training iteration, timed with the same
    sustained-chain protocol (fresh inputs, one block at the end):

    * fwd            — student forward only (the inference path)
    * supervised     — 1x fwd+bwd + AdamW (SupervisedTrainer step)
    * grad-backbone  — fwd+bwd with grads flowing ONLY through the
                       backbone (head losses on stop_gradient feats
                       still computed; isolates backbone backward)
    * grad-head      — fwd+bwd with feats stop_gradient'ed (isolates
                       decode/aux-head backward)
    """
    import jax
    import optax

    from pfst_tpu.apis.train import SupervisedTrainer
    from pfst_tpu.models import build_segmentor
    from pfst_tpu.utils.config import Config

    cfg = Config.fromfile(
        'configs/pfst/pfst_pots_irrg2vaih_irrg_deeplabv3plus_r50-d8.py')
    model_cfg = dict(cfg['model'])
    if dtype == 'bf16':
        model_cfg['dtype'] = 'bfloat16'
    model_cfg.pop('train_cfg', None)
    model = build_segmentor(model_cfg)
    algo = SupervisedTrainer(model)
    tx = optax.adamw(6e-5, weight_decay=0.01)
    state = algo.init_state(jax.random.PRNGKey(0), (1, 64, 64, 3), tx)

    if mode == 'fwd':
        @jax.jit
        def piece(variables, img):
            out, _ = model.apply(variables, img, train=True,
                                 mutable=['batch_stats'],
                                 method=model.encode_decode)
            return out[0].mean()

        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        run = lambda img, i: piece(variables, img)  # noqa: E731
    elif mode == 'fwd-eval':
        # eval-mode forward (BN uses running stats, fused into the
        # conv epilogue; no dropout) — the delta vs 'fwd' is the price
        # of train-mode BN statistics + dropout
        @jax.jit
        def piece(variables, img):
            out = model.apply(variables, img, train=False,
                              method=model.encode_decode)
            return out[0].mean()

        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        run = lambda img, i: piece(variables, img)  # noqa: E731
    elif mode == 'supervised':
        step = algo.make_train_step(
            tx, mean=[123.675, 116.28, 103.53],
            std=[58.395, 57.12, 57.375])
        holder = [state]
        gt_cache = np.random.RandomState(9).randint(
            0, 6, (batch_size, size, size)).astype(np.int32)

        def run(img, i):
            batch = {'img': img, 'gt_semantic_seg': gt_cache}
            s, lv, _ = step(holder[0], batch,
                            jax.random.fold_in(jax.random.PRNGKey(1),
                                               i))
            holder[0] = s
            return lv['loss']
    elif mode in ('grad-backbone', 'grad-head'):
        import jax.numpy as jnp

        def loss_fn(params, batch_stats, img, gt):
            def fwd(p):
                (losses, _), _ = model.apply(
                    {'params': p, 'batch_stats': batch_stats}, img, gt,
                    train=True, mutable=['batch_stats'],
                    method=model.forward_train)
                total = sum(jnp.mean(v) for k, v in losses.items()
                            if 'loss' in k)
                return total
            return fwd(params)

        if mode == 'grad-head':
            # stop grads into the backbone by freezing its params
            def grad_target(params, batch_stats, img, gt):
                frozen = dict(params)
                frozen['backbone_mod'] = jax.lax.stop_gradient(
                    params['backbone_mod'])
                return loss_fn(frozen, batch_stats, img, gt)
        else:
            def grad_target(params, batch_stats, img, gt):
                live = dict(params)
                for k in params:
                    if k != 'backbone_mod':
                        live[k] = jax.lax.stop_gradient(params[k])
                return loss_fn(live, batch_stats, img, gt)

        @jax.jit
        def piece(params, batch_stats, img, gt):
            val, grads = jax.value_and_grad(grad_target)(
                params, batch_stats, img, gt)
            return val, jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.sum(jnp.abs(g).astype(
                    jnp.float32)), grads, 0.0)

        gt_cache = np.random.RandomState(9).randint(
            0, 6, (batch_size, size, size)).astype(np.int32)

        def run(img, i):
            return piece(state.params, state.batch_stats, img,
                         gt_cache)[1]
    else:
        raise ValueError(mode)

    rs = np.random.RandomState(0)
    imgs = [rs.randn(batch_size, size, size, 3).astype(np.float32)
            for i in range(warmup)]
    for i in range(warmup):
        out = run(imgs[i], i)
    _ = np.asarray(out)
    best = None
    for rep in range(reps):
        # device-resident inputs: pieces measure pure compute (the
        # transfer story is quantified separately; see PERF.md)
        imgs = [jax.device_put(
            rs.randn(batch_size, size, size, 3).astype(np.float32))
            for _ in range(steps)]
        jax.block_until_ready(imgs)
        t0 = time.perf_counter()
        outs = [run(im, 10 + rep * steps + i)
                for i, im in enumerate(imgs)]
        # the single device executes programs in order: materializing
        # the LAST output proves all steps finished.  Do NOT loop
        # np.asarray over every output — each one is a tunnel
        # round-trip (~tens of ms) that inflates the per-step time.
        _ = np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / steps
        print(f'# {mode} rep {rep}: {dt:.3f} s/iter')
        best = dt if best is None else min(best, dt)
    rec = {'metric': f'train-piece {mode} 512^2', 'batch': batch_size,
           'dtype': dtype, 's_per_iter': round(best, 4)}
    print(json.dumps(rec))
    return rec


def run_breakdown(batch_size, dtype, size, steps, args):
    """Time each of the four split programs in isolation."""
    import jax

    algo, state, step = build(batch_size, size, dtype,
                              no_aux=args.no_aux,
                              no_strongaug=args.no_strongaug)
    progs = step.programs
    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(42)
    # one full step to compile everything
    b = make_batch(rs, batch_size, size)
    state, lv, _ = step(state, b, rng)
    _ = np.asarray(lv['loss'])

    out = {}
    # ema: state -> state
    t0 = time.perf_counter()
    s = state
    for i in range(steps):
        s = progs['ema'](s)
    _ = np.asarray(jax.tree_util.tree_leaves(s.ema_params)[0]
                   .ravel()[:1])
    out['ema'] = (time.perf_counter() - t0) / steps
    state = s

    # teacher: fresh target images, DEVICE-RESIDENT (numpy args crawl
    # through the tunnel at ~40-60 MB/s and would dominate the timing
    # — see PERF.md "transfer paths")
    imgs = put_batches(
        [rs.randn(batch_size, size, size, 3).astype(np.float32)
         for _ in range(steps)])
    t0 = time.perf_counter()
    touts = [progs['teacher'](state.ema_params, state.ema_batch_stats,
                              im) for im in imgs]
    # materialize ONE on-device 1-element slice of the last output —
    # np.asarray of the full logits would time a 25 MB tunnel transfer
    _ = np.asarray(touts[-1][0].ravel()[:1])
    out['teacher'] = (time.perf_counter() - t0) / steps

    # mix: fresh device-resident batches, reuse per-step teacher_out
    batches = put_batches(
        [make_batch(rs, batch_size, size) for _ in range(steps)])
    t0 = time.perf_counter()
    premixes = [progs['mix'](bb, jax.random.fold_in(rng, i), touts[i])
                for i, bb in enumerate(batches)]
    _ = np.asarray(premixes[-1]['mixed_img'].ravel()[:1])
    out['mix'] = (time.perf_counter() - t0) / steps

    # opt: the big student 2xfwd+bwd + optimizer program
    t0 = time.perf_counter()
    for i, bb in enumerate(batches):
        state, lv, _ = progs['opt'](state, bb,
                                    jax.random.fold_in(rng, 100 + i),
                                    premixes[i])
    _ = np.asarray(lv['loss'])
    _ = np.asarray(jax.tree_util.tree_leaves(state.params)[0]
                   .ravel()[:1])
    out['opt'] = (time.perf_counter() - t0) / steps

    rec = {'metric': 'PFGST train-step breakdown', 'batch': batch_size,
           'dtype': dtype,
           **{k: round(v, 4) for k, v in out.items()},
           'sum': round(sum(out.values()), 4)}
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, nargs='*', default=[2])
    ap.add_argument('--dtype', choices=['fp32', 'bf16', 'both'],
                    default='both')
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--steps', type=int, default=12)
    ap.add_argument('--reps', type=int, default=2)
    ap.add_argument('--warmup', type=int, default=2)
    ap.add_argument('--breakdown', action='store_true')
    ap.add_argument('--mode', default=None,
                    choices=['fwd', 'fwd-eval', 'supervised',
                             'grad-backbone', 'grad-head'],
                    help='time an isolated piece instead of the full '
                         'UDA step')
    ap.add_argument('--no-aux', action='store_true',
                    help='ablate the PFGST aux losses')
    ap.add_argument('--no-strongaug', action='store_true',
                    help='ablate jitter/blur')
    ap.add_argument('--fused', action='store_true',
                    help='single fused program instead of split')
    ap.add_argument('--no-merge', dest='no_merge',
                    action='store_true',
                    help='sequential source/mixed student passes '
                         'instead of the merged vmapped pass (A/B '
                         'for the per-op-overhead optimization)')
    ap.add_argument('--flat-opt', dest='flat_opt',
                    action='store_true',
                    help='optax.flatten the optimizer (single-vector '
                         'AdamW update; dispatch-floor A/B)')
    ap.add_argument('--with-cp', dest='with_cp', action='store_true',
                    help='per-block remat in the backbone (fits '
                         'batch >= 16 at 512^2)')
    ap.add_argument('--max-inflight', type=int, default=None,
                    help='bound the async dispatch queue to N steps '
                         '(each queued step pins its input batch in '
                         'HBM; use ~3 for batch >= 16 at 512^2)')
    ap.add_argument('--device-inputs', action='store_true',
                    help='pre-transfer batches to device before '
                         'timing (isolates tunnel transfer cost)')
    ap.add_argument('--transfer-mode', dest='transfer_mode',
                    default='inline',
                    choices=['inline', 'serial', 'prefetch'],
                    help='how host batches reach the device: main-'
                         'thread put after dispatch (inline), put '
                         'before dispatch (serial), or a background '
                         'prefetch thread (prefetch)')
    ap.add_argument('--flops', action='store_true',
                    help='also report compiler-counted FLOPs/MFU')
    ap.add_argument('--json-out', default=None)
    args = ap.parse_args()

    from pfst_tpu.utils.set_env import setup_environment
    setup_environment()

    dtypes = ['bf16', 'fp32'] if args.dtype == 'both' else [args.dtype]
    recs = []
    for bsz in args.batch:
        for dt in dtypes:
            if args.mode:
                recs.append(run_mode(args.mode, bsz, dt, args.size,
                                     args.steps, args.reps,
                                     args.warmup))
            elif args.breakdown:
                recs.append(run_breakdown(bsz, dt, args.size,
                                          args.steps, args))
            else:
                recs.append(run_one(bsz, dt, args.size, args.steps,
                                    args.reps, args.warmup, args))
    if args.json_out:
        with open(args.json_out, 'a') as f:
            for r in recs:
                f.write(json.dumps(r) + '\n')


if __name__ == '__main__':
    main()
