"""UDA base: wraps a student segmentor + EMA teacher as pure state.

TPU-native re-design of ``rsiseg/models/uda/uda_decorator.py``: instead
of an nn.Module owning three sub-models with in-place EMA updates, the
algorithm is a plain orchestrator whose *state* is an immutable pytree
(student params/batch-stats, teacher params/batch-stats, optimizer
state, step) and whose ``train_step`` is a single pure function that
jits end-to-end — EMA update, teacher forward, pseudo-labeling,
ClassMix, both student passes and the optimizer all fuse into one XLA
program with zero host round-trips (the reference crosses host<->device
repeatedly, e.g. ``pfgst.py:262``).
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..builder import build_segmentor


@struct.dataclass
class UDATrainState:
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # frozen ImageNet-init copy for the DACS feature-distance
    # regulariser (``dacs.py:151-161``); empty when fdist is off
    imnet_params: Any = None


def maybe_normalize_images(batch, mean, std):
    """Deferred normalization (``DeferNormalize`` pipeline): image
    arrays shipped in the 0-255 domain as float16/uint8 are normalized
    on device; already-normalized float32 batches pass through
    untouched.  Applied at the top of every train-step program so
    single-chip, split-compile and shard_map paths all honor the wire
    format."""
    out = dict(batch)
    for k, v in batch.items():
        if v is None or not hasattr(v, 'dtype'):
            continue
        if 'img' in k and v.dtype in (jnp.float16, jnp.uint8):
            out[k] = (v.astype(jnp.float32) - mean) / std
    return out


class UDADecorator:
    """Common construction + inference delegation to the student."""

    def __init__(self, **cfg):
        self.cfg = cfg
        self.model_cfg = copy.deepcopy(cfg['model'])
        self.train_cfg = cfg['model'].get('train_cfg')
        self.test_cfg = cfg['model'].get('test_cfg')
        self.num_classes = cfg['model']['decode_head']['num_classes']
        self.max_iters = cfg.get('max_iters', 40000)
        # the student segmentor module (also used, with separate
        # variables, as the EMA teacher — same architecture)
        self.model = build_segmentor(self.model_cfg)

    def get_model(self):
        return self.model

    # -- state ------------------------------------------------------------
    def init_state(self, rng: jax.Array, img_shape, tx) -> UDATrainState:
        img = jnp.zeros(img_shape, jnp.float32)
        # jit the init: eager flax init replays every op through the
        # runtime individually (minutes over a tunneled backend)
        variables = jax.jit(
            lambda r, im: self.model.init({'params': r}, im,
                                          train=False))(rng, img)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        enable_fdist = bool(getattr(self, 'enable_fdist', False))
        # deep copies, NOT aliases: a donated train step must never see
        # the same buffer through two arguments ("donate twice" error)
        copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
        return UDATrainState(
            params=params,
            batch_stats=batch_stats,
            # reference inits the teacher from the student at iter 0
            # (``pfgst.py:105-114``)
            ema_params=copy(params),
            ema_batch_stats=copy(batch_stats),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            # frozen fdist reference = the INITIAL student (reference
            # ``dacs.py`` deepcopies the pretrained model); meaningful
            # only after a warm start — apis.train's
            # load_weights_into_state refreshes this copy from the
            # loaded weights so it is the pretrained init, not random
            imnet_params=copy(params) if enable_fdist else {})

    def ema_update(self, state: UDATrainState,
                   alpha: float) -> UDATrainState:
        """theta_t = a*theta_t + (1-a)*theta_s with
        a = min(1 - 1/(iter+1), alpha) (``pfgst.py:116-127``).

        Applied before the forward at every step; at step 0 the factor
        is 0, reproducing ``_init_ema_weights``.
        """
        a = jnp.minimum(1.0 - 1.0 / (state.step.astype(jnp.float32) + 1.0),
                        alpha)
        new_ema = jax.tree.map(lambda e, p: a * e + (1.0 - a) * p,
                               state.ema_params, state.params)
        return state.replace(ema_params=new_ema)

    # -- inference (delegates to the student) ------------------------------
    def student_variables(self, state: UDATrainState):
        v = {'params': state.params}
        if state.batch_stats:
            v['batch_stats'] = state.batch_stats
        return v

    def teacher_variables(self, state: UDATrainState):
        v = {'params': state.ema_params}
        if state.ema_batch_stats:
            v['batch_stats'] = state.ema_batch_stats
        return v

    def encode_decode(self, state: UDATrainState, img):
        return self.model.apply(self.student_variables(state), img,
                                train=False,
                                method=self.model.encode_decode)

    def inference(self, state: UDATrainState, img, **kw):
        return self.model.apply(self.student_variables(state), img,
                                method=self.model.inference, **kw)
