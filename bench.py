#!/usr/bin/env python
"""North-star benchmark: fused inference + pseudo-label generation.

Metric (BASELINE.json): 512^2 patches/sec/chip for DeepLabV3+
ResNet-50-V1c OS8 forward + softmax + max-prob pseudo-labels +
confidence thresholding — the teacher path of the PFST UDA step
(reference ``pfgst.py:253-268`` + ``tools/benchmark.py:80-117``
measurement protocol: warmup then synchronized timing).

The whole pipeline is ONE jitted XLA program: no host round-trips
between inference and pseudo-label generation (the reference crosses
host<->device at ``pfgst.py:262``).

``vs_baseline``: the reference repo ships no number
(``BASELINE.md``); the denominator below is the mmsegmentation model
zoo's published DeepLabV3+ R50-d8 512x512 V100 throughput
(~21 img/s, fp32, cudnn.benchmark=False) as the best available proxy
for the reference protocol.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_GPU_PATCHES_PER_SEC = 21.0
BATCH = 24  # sweep on v5e-1: {8: 278, 16: 347, 20: 292, 24: 360,
#              28: 286, 32: 339, 40: 343, 48: 348} — 24 peaks
SIZE = 512
THRESHOLD = 0.98
STEPS = 30
WARMUP = 5


def build():
    from __graft_entry__ import _flagship_cfg
    from pfst_tpu.models import build_segmentor

    # bfloat16 compute (MXU-native), float32 params/BN stats
    model = build_segmentor({**_flagship_cfg(num_classes=6),
                             'dtype': jnp.bfloat16})
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda r, im: model.init({'params': r}, im,
                                 train=False))(rng, small)

    @jax.jit
    def fused_infer_pseudo_label(variables, img):
        # teacher forward (train-mode BN like the PFST teacher), full
        # softmax, confidence pseudo-labels + quality weight — all fused
        logits, _ = model.apply(variables, img,
                                method=model.encode_decode)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        pseudo_prob = jnp.max(probs, axis=-1)
        pseudo_label = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        mask = pseudo_prob >= THRESHOLD
        quality = jnp.mean(mask.astype(jnp.float32))
        return pseudo_label, pseudo_prob, quality

    return fused_infer_pseudo_label, variables, img


V5E_BF16_PEAK_TFLOPS = 197.0


def _program_flops(fn, variables, img):
    """Compiler-counted FLOPs of the jitted program (honest MFU
    numerator; counts multiply+add separately)."""
    try:
        cost = fn.lower(variables, img).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get('flops', float('nan')))
    except Exception:
        return float('nan')


def bench_train_step():
    """Sustained full-UDA-train-step rate (batch 2, bf16), measured
    twice: with host-numpy batches (includes the host->device batch
    transfer — the tunnel-inclusive wall number) and with
    device-resident batches (pure device compute).  On bandwidth-
    starved links the two diverge by the transfer time; see PERF.md.
    Set PFST_BENCH_TRAIN=0 to skip (saves the compile)."""
    import os
    if os.environ.get('PFST_BENCH_TRAIN', '1') == '0':
        return {}
    import jax

    import bench_train as bt

    batch_size, steps = 2, 10

    def _run(no_merge):
        _, state, step = bt.build(batch_size, SIZE, 'bf16',
                                  no_merge=no_merge)
        rs = np.random.RandomState(0)
        rng = jax.random.PRNGKey(7)
        for i in range(2):  # compile + warm
            state, lv, _ = step(state, bt.make_batch(rs, batch_size,
                                                     SIZE),
                                jax.random.fold_in(rng, 900 + i))
        _ = np.asarray(lv['loss'])

        out = {}

        def timed(label, wire=None, resident=False, warm=0,
                  rng_base=0):
            # one shared protocol for every train timing: optional
            # compile+warm of the wire-specific program, then
            # best-of-2 12-step chains with 'serial' puts (the
            # measured optimum on this backend — concurrent puts
            # DELAY the running program,
            # artifacts/bench_train_transfer_r4.log)
            nonlocal state
            for i in range(warm):
                state, lv, _ = step(
                    state, bt.make_batch(rs, batch_size, SIZE,
                                         wire=wire),
                    jax.random.fold_in(rng, 950 + i))
            if warm:
                _ = np.asarray(lv['loss'])
            best = None
            for rep in range(2):
                batches = [bt.make_batch(rs, batch_size, SIZE,
                                         wire=wire)
                           for _ in range(steps)]
                if resident:
                    batches = bt.put_batches(batches)
                rngs = [jax.random.fold_in(
                    rng, rng_base + rep * steps + i)
                    for i in range(steps)]
                dt, state = bt.timed_chain(step, state, batches,
                                           rngs, transfer='serial')
                per = dt / steps
                best = per if best is None else min(best, per)
            out[label] = round(best, 4)

        timed('train_s_per_iter_with_transfers')
        timed('train_s_per_iter', resident=True)
        out['train_img_per_sec'] = round(
            batch_size / out['train_s_per_iter'], 2)
        # the device_normalize SHIPPING path (uint8 wire + on-device
        # normalization — the round-5 DefaultFormatBundle fix made it
        # real): 4x fewer bytes past the aging tunnel put, the train
        # CLI's actual configuration for bounded data time
        timed('train_s_per_iter_uint8_wire', wire='uint8', warm=2,
              rng_base=300)
        # measured THIS session: the with-transfers number embeds the
        # link-of-the-moment (the tunnel swings 36-428 MB/s across
        # sessions — artifacts/transfer_r4.log), so BENCH records the
        # session's own host->device bandwidth next to it and a
        # machine-readable caveat for cross-round comparisons
        bw = []
        for _ in range(3):
            b = bt.make_batch(rs, batch_size, SIZE)
            nbytes = sum(int(a.nbytes) for a in
                         jax.tree_util.tree_leaves(b))
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(b))
            bw.append(nbytes / (time.perf_counter() - t0) / 1e6)
        out['train_transfer_bandwidth_mbps'] = round(max(bw), 1)
        out['train_with_transfers_caveat'] = (
            'link-dependent: valid only at '
            'train_transfer_bandwidth_mbps; compare rounds on '
            'train_s_per_iter (device-resident) instead')
        tflop = bt.program_flops(step, state,
                                 bt.make_batch(rs, batch_size, SIZE),
                                 rng)
        if np.isfinite(tflop):
            achieved = tflop / out['train_s_per_iter'] / 1e12
            out['train_achieved_tflops'] = round(achieved, 2)
            out['train_mfu_pct_v5e_bf16'] = round(
                100 * achieved / V5E_BF16_PEAK_TFLOPS, 1)
        out['train_note'] = (
            'full PFGST UDA iteration (EMA+teacher+ClassMix+merged '
            'source/mixed student fwd+bwd+PFGST losses+AdamW), '
            f'{SIZE}^2 batch {batch_size} bf16; '
            '_with_transfers includes host->device batch transfer '
            '(serial put — the measured optimum on this backend, '
            'where concurrent puts delay the running program)')
        return out

    try:
        out = _run(False)
        out['train_merged_passes'] = True
        return out
    except Exception as e:  # the headline metric must still print;
        # if the merged program trips the remote compile helper, fall
        # back to the sequential two-pass step so BENCH still carries
        # a train entry
        try:
            out = _run(True)
            out['train_merged_passes'] = False
            out['train_merge_fallback_error'] = (
                f'{type(e).__name__}: {e}')
            return out
        except Exception as e2:
            return {'train_bench_error': f'{type(e2).__name__}: {e2}'}


def _init_watchdog(seconds: float):
    """The tunneled TPU backend can wedge on init (device enumeration
    hangs when the tunnel is down).  The driver needs ONE JSON line no
    matter what — emit an error record and exit if the backend doesn't
    come up in time.  Disarm by setting the returned event."""
    import os
    import threading
    done = threading.Event()

    def fire():
        if not done.wait(seconds):
            print(json.dumps({
                'metric': 'fused infer+pseudo-label 512^2 '
                          'patches/sec/chip',
                'value': 0.0, 'unit': 'patches/sec/chip',
                'vs_baseline': 0.0,
                'error': f'backend init exceeded {seconds:.0f}s '
                         '(TPU tunnel down?)'}), flush=True)
            os._exit(17)

    threading.Thread(target=fire, daemon=True).start()
    return done


def main():
    import os
    from pfst_tpu.utils.set_env import setup_environment
    setup_environment()
    watchdog = _init_watchdog(float(os.environ.get(
        'PFST_BENCH_INIT_TIMEOUT', '900')))
    jax.devices()  # touch the backend: this is the call that hangs
    watchdog.set()
    fn, variables, img = build()
    flops = _program_flops(fn, variables, img)
    # vary the input every step and force a host transfer at the end:
    # on tunneled backends `block_until_ready` may not actually block
    # and identical executions can be elided, which inflates naive
    # timings by orders of magnitude.
    imgs = [img + 0.001 * i for i in range(STEPS)]
    for i in range(WARMUP):
        out = fn(variables, imgs[i % STEPS])
    _ = np.asarray(out[2])
    best = None
    for rep in range(4):  # best-of-4: tunnel jitter is one-sided slow
        # fresh inputs EVERY rep — repeating rep 1's exact executions
        # could be elided by the backend (see comment above), which
        # would make min() pick a bogus near-zero time
        imgs = [img + 0.001 * (1 + rep * STEPS + i)
                for i in range(STEPS)]
        jax.block_until_ready(imgs[-1])
        t0 = time.perf_counter()
        outs = [fn(variables, imgs[i]) for i in range(STEPS)]
        _ = [np.asarray(o[2]) for o in outs]
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    patches_per_sec = BATCH * STEPS / best
    rec = {
        'metric': 'fused infer+pseudo-label 512^2 patches/sec/chip',
        'value': round(patches_per_sec, 2),
        'unit': 'patches/sec/chip',
        'vs_baseline': round(
            patches_per_sec / REFERENCE_GPU_PATCHES_PER_SEC, 2),
        # the reference repo publishes NO number (BASELINE.md); the
        # denominator is mmsegmentation's published DeepLabV3+ R50-d8
        # 512^2 V100 fp32 throughput (~21 img/s) as a proxy for the
        # reference protocol — not a measured reference run.
        'vs_baseline_note': (
            'denominator is a PROXY: mmseg published V100 throughput '
            '(~21 img/s) for this model; the reference repo ships no '
            'measured number (see BASELINE.md / PERF.md)'),
    }
    if np.isfinite(flops):
        achieved = flops / (best / STEPS) / 1e12
        rec['achieved_tflops'] = round(achieved, 1)
        rec['mfu_pct_v5e_bf16'] = round(
            100 * achieved / V5E_BF16_PEAK_TFLOPS, 1)
    rec.update(bench_train_step())
    rec.update(bench_int8(fn, variables, img))
    print(json.dumps(rec))


def bench_int8(fn, variables, img):
    """Int8-PTQ A/B of the same fused program (on by default so the
    record self-documents the s8 lever; PFST_BENCH_INT8=0 to skip —
    see tools/int8_microbench.py for the standalone version with
    accuracy checks)."""
    import os
    if os.environ.get('PFST_BENCH_INT8', '1') == '0':
        return {}
    try:
        from pfst_tpu.ops.quant import int8_inference
        with int8_inference():
            qfn = jax.jit(fn.__wrapped__)
            imgs = [img + 0.001 * i for i in range(STEPS)]
            for i in range(WARMUP):
                out = qfn(variables, imgs[i % STEPS])
            _ = np.asarray(out[2])
            best = None
            for rep in range(3):
                imgs = [img + 0.001 * (1 + rep * STEPS + i)
                        for i in range(STEPS)]
                jax.block_until_ready(imgs[-1])
                t0 = time.perf_counter()
                outs = [qfn(variables, imgs[i]) for i in range(STEPS)]
                _ = [np.asarray(o[2]) for o in outs]
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        return {'int8_patches_per_sec': round(BATCH * STEPS / best, 2),
                'int8_note': 'same fused program, s8 convs '
                             '(PTQ, dynamic act scales)'}
    except Exception as e:
        return {'int8_bench_error': f'{type(e).__name__}: {e}'}


if __name__ == '__main__':
    main()
