#!/usr/bin/env python
"""HTTP model server — the TPU-native counterpart of the reference's
``tools/torchserve/`` (``mmseg2torchserve.py`` + ``mmseg_handler.py``).

Serves a segmentor checkpoint over a torchserve-compatible surface:

- ``GET  /ping``                  → ``{"status": "Healthy"}``
- ``POST /predictions/<model>``   → request body = image bytes (png/
  jpg/tif; raw or base64) → response body = PNG-encoded label map
  (uint8 trainIds), mirroring ``mmseg_handler.MMsegHandler``.
  ``?render=1`` returns the palette overlay instead of raw labels.

Design: one process owns the chip; requests are decoded on worker
threads (``ThreadingHTTPServer``) and funneled through a lock into the
jitted forward. The forward program is compiled once per padded input
shape and cached, so steady-state requests run a single XLA program
with no retracing.

Usage::

    python tools/serve.py <config> <checkpoint> [--port 8080]
    curl http://localhost:8080/ping
    curl -X POST -T image.png http://localhost:8080/predictions/m > mask.png
"""
import argparse
import base64
import binascii
import json
import os.path as osp
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import cv2
import jax
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


class _MicroBatcher:
    """Groups concurrent single-image forwards into one program call.

    Requests land on a queue; a dispatcher thread collects up to
    ``max_batch`` same-shaped requests within a short linger window,
    pads the group to exactly ``max_batch`` (so only two program
    shapes ever compile: 1 and max_batch), runs ONE forward, and
    scatters the per-image results to the waiting handler threads.
    The reference's torchserve handler processes requests strictly
    one at a time."""

    def __init__(self, apply_one, max_batch: int, linger_ms=4.0):
        import queue as _q
        self.apply = apply_one
        self.max_batch = int(max_batch)
        self.linger = linger_ms / 1000.0
        self.q: '_q.Queue' = _q.Queue()
        self.group_sizes = []  # observability + tests
        self._stash = None
        t = threading.Thread(target=self._loop, daemon=True)
        t.start()

    def __call__(self, variables, img):
        from concurrent.futures import Future
        fut = Future()
        self.q.put((variables, img, fut))
        return fut.result()

    def _collect(self):
        import queue as _q
        import time as _t
        first = self._stash or self.q.get()
        self._stash = None
        group = [first]
        deadline = _t.monotonic() + self.linger
        while len(group) < self.max_batch:
            timeout = deadline - _t.monotonic()
            if timeout <= 0:
                break
            try:
                item = self.q.get(timeout=timeout)
            except _q.Empty:
                break
            if item[1].shape != first[1].shape:
                self._stash = item  # different shape: its own group
                break
            group.append(item)
        return group

    def _loop(self):
        import jax.numpy as jnp
        while True:
            group = self._collect()
            variables = group[0][0]
            try:
                n = len(group)
                imgs = [im for (_, im, _) in group]
                if n > 1 and n < self.max_batch:
                    imgs = imgs + [imgs[-1]] * (self.max_batch - n)
                batch = imgs[0] if len(imgs) == 1 else \
                    jnp.concatenate(imgs, axis=0)
                probs, _ = self.apply(variables, batch)
                self.group_sizes.append(n)
                if len(self.group_sizes) > 1000:
                    del self.group_sizes[:500]
                for i, (_, _, fut) in enumerate(group):
                    fut.set_result((probs[i:i + 1], None))
            except Exception as e:
                for (_, _, fut) in group:
                    if not fut.done():
                        fut.set_exception(e)


def _swap_normalize(node, wire):
    """Recursively swap the first Normalize for DeferNormalize —
    real deploy configs nest it inside MultiScaleFlipAug's
    ``transforms`` list, not at the pipeline's top level."""
    from pfst_tpu.datasets.pipelines import DeferNormalize
    return DeferNormalize.swap_into(node, wire)


class Predictor:
    """Checkpointed segmentor with a shape-keyed jit cache."""

    def __init__(self, config, checkpoint=None, seed=0,
                 quant_int8=False, act_scales=None, max_batch=1,
                 spatial=0, device_normalize=None):
        self.quant_int8 = quant_int8
        self.act_scales = act_scales
        self.spatial = int(spatial or 0)
        self.max_batch = int(max_batch or 1)
        self._batcher = (_MicroBatcher(self._apply_fn, self.max_batch)
                         if self.max_batch > 1 else None)
        from pfst_tpu.apis.inference import init_segmentor
        self.model, self.variables = init_segmentor(config, checkpoint)
        # --device-normalize: request images cross the host->device
        # link as uint8 (or float16) and are normalized on device —
        # 4x (2x) fewer wire bytes per request, the serving analog of
        # cfg.data.device_normalize (PERF.md round 5: the tunnel put
        # path ages; narrow wires bound it). Swaps the test pipeline's
        # Normalize for DeferNormalize; the normalization itself runs
        # as a tiny jitted program before the cached inference fn.
        self._dev_norm = None
        if device_normalize:
            wire = device_normalize if isinstance(device_normalize,
                                                  str) else 'uint8'
            norm = _swap_normalize(
                self.model.cfg.data['test']['pipeline'], wire)
            if norm is None:
                # e.g. EO pipelines (ClipNormalize): nothing to defer
                print('warning: --device-normalize: no Normalize '
                      'transform in the test pipeline; serving with '
                      'the host-side pipeline unchanged',
                      file=sys.stderr)
            else:
                import jax.numpy as jnp
                mean = jnp.asarray(norm['mean'], jnp.float32)
                std = jnp.asarray(norm['std'], jnp.float32)
                self._dev_norm = jax.jit(
                    lambda im: (im.astype(jnp.float32) - mean) / std)
        if self.variables is None:  # smoke-serving without a checkpoint
            import jax.numpy as jnp
            rng = jax.random.PRNGKey(seed)
            small = jnp.zeros((1, 64, 64, 3), jnp.float32)
            self.variables = jax.jit(
                lambda r, im: self.model.init({'params': r}, im,
                                              train=False))(rng, small)
        self._jitted = {}
        self._lock = threading.Lock()
        self.palette = np.asarray(
            self.model.cfg.get('palette')
            or np.random.RandomState(42).randint(0, 255, (256, 3)),
            np.uint8)

    def _apply_fn(self, variables, batch_img):
        import jax.numpy as jnp
        if self._dev_norm is not None and \
                batch_img.dtype != jnp.float32:
            # wire image (uint8/f16, 0-255): normalize on device; the
            # dtype branch is host-side so each wire format gets its
            # own tiny cached program
            batch_img = self._dev_norm(batch_img)
        key = tuple(batch_img.shape)
        fn = self._jitted.get(key)
        if fn is None:
            model = self.model
            if self.spatial:
                # huge-scene serving: shard each forward's H axis over
                # the mesh (apis/test.py::make_spatial_inference_fn —
                # edge-pads non-divisible heights); wrapped to match
                # model.inference's (probs, states) contract
                from pfst_tpu.apis.test import make_spatial_inference_fn
                sp_fn = make_spatial_inference_fn(model, self.spatial)
                # sp_fn yields PRE-softmax logits (the eval path
                # resizes logits before softmax); inference_segmentor
                # sums outputs across TTA views, so serving must hand
                # it probabilities like model.inference does
                fn = lambda v, im: (  # noqa: E731
                    jax.nn.softmax(sp_fn(v, im), axis=-1), None)
            else:
                fn = jax.jit(lambda v, im: model.apply(
                    v, im, method=model.inference))
            self._jitted[key] = fn
        if self.quant_int8:
            # the int8 interceptor must be active at TRACE time; jit
            # caches per shape so only the first call re-traces
            from pfst_tpu.ops.quant import int8_inference
            with int8_inference(act_scales=self.act_scales):
                return fn(variables, batch_img)
        return fn(variables, batch_img)

    def predict(self, img_bgr: np.ndarray) -> np.ndarray:
        from pfst_tpu.apis.inference import inference_segmentor
        if self._batcher is not None:
            # the dispatcher thread serializes chip access and groups
            # concurrent requests into one forward — no lock here
            return inference_segmentor(
                self.model, self.variables, img_bgr,
                apply_fn=self._batcher).astype(np.uint8)
        with self._lock:  # one chip, one program at a time
            return inference_segmentor(
                self.model, self.variables, img_bgr,
                apply_fn=self._apply_fn).astype(np.uint8)

    def render(self, img_bgr, labels, opacity=0.5):
        color = self.palette[labels.astype(np.int64) % len(self.palette)]
        color = color[..., ::-1]  # palette is RGB, the canvas is BGR
        return (img_bgr * (1 - opacity) + color * opacity).astype(
            np.uint8)


def decode_image(body: bytes) -> np.ndarray:
    """Image bytes (raw or base64, like the torchserve handler)."""
    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        try:
            raw = base64.b64decode(body, validate=True)
        except (binascii.Error, ValueError):
            raise ValueError('request body is not a decodable image')
        img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                           cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError('request body is not a decodable image')
    return img


def make_handler(predictor: Predictor):

    class Handler(BaseHTTPRequestHandler):

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code, body, ctype='application/octet-stream'):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.rstrip('/') == '/ping':
                self._send(200, json.dumps({'status': 'Healthy'})
                           .encode(), 'application/json')
            else:
                self._send(404, b'{"error": "not found"}',
                           'application/json')

        def do_POST(self):
            if not self.path.startswith('/predictions'):
                self._send(404, b'{"error": "not found"}',
                           'application/json')
                return
            length = int(self.headers.get('Content-Length', 0))
            body = self.rfile.read(length)
            try:
                img = decode_image(body)
                labels = predictor.predict(img)
                if 'render=1' in (self.path.split('?', 1) + [''])[1]:
                    out = predictor.render(img, labels)
                else:
                    out = labels
                ok, buf = cv2.imencode('.png', out)
                assert ok
                self._send(200, buf.tobytes(), 'image/png')
            except ValueError as e:
                self._send(400, json.dumps({'error': str(e)}).encode(),
                           'application/json')
            except Exception as e:  # keep the server alive
                self._send(500, json.dumps({'error': repr(e)}).encode(),
                           'application/json')

    return Handler


def build_server(config, checkpoint=None, host='127.0.0.1', port=8080,
                 quant_int8=False, act_scales=None, max_batch=1,
                 spatial=0, device_normalize=None):
    predictor = Predictor(config, checkpoint, quant_int8=quant_int8,
                          act_scales=act_scales, max_batch=max_batch,
                          spatial=spatial,
                          device_normalize=device_normalize)
    return ThreadingHTTPServer((host, port), make_handler(predictor))


def parse_args(args=None):
    p = argparse.ArgumentParser(description='Serve a segmentor over HTTP')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--host', default='0.0.0.0')
    p.add_argument('--port', type=int, default=8080)
    p.add_argument('--quant-int8', action='store_true',
                   help='int8-PTQ convolutions (pfst_tpu/ops/quant.py)')
    p.add_argument('--act-scales', default=None,
                   help='static activation-scale JSON from '
                        'tools/calibrate_int8.py')
    p.add_argument('--max-batch', type=int, default=1,
                   help='micro-batch concurrent requests into one '
                        'forward (1 = serialize, torchserve-style)')
    p.add_argument('--spatial', type=int, default=0,
                   help='shard each forward\'s H axis over this many '
                        'devices (huge-scene serving; '
                        'parallel/spatial.py)')
    p.add_argument('--device-normalize', nargs='?', const='uint8',
                   default=None, choices=['uint8', 'float16'],
                   help='ship request images over the host->device '
                        'link in the 0-255 domain (uint8 = 4x fewer '
                        'bytes) and normalize on device')
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    scales = None
    if args.act_scales:
        scales = json.load(open(args.act_scales))
    server = build_server(args.config, args.checkpoint, args.host,
                          args.port, quant_int8=args.quant_int8,
                          act_scales=scales, max_batch=args.max_batch,
                          spatial=args.spatial,
                          device_normalize=args.device_normalize)
    print(f'serving on http://{args.host}:{server.server_address[1]}',
          file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == '__main__':
    main()
