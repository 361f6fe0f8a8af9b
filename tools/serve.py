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


class Predictor:
    """Checkpointed segmentor with a shape-keyed jit cache."""

    def __init__(self, config, checkpoint=None, seed=0,
                 quant_int8=False, act_scales=None):
        self.quant_int8 = quant_int8
        self.act_scales = act_scales
        from pfst_tpu.apis.inference import init_segmentor
        self.model, self.variables = init_segmentor(config, checkpoint)
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
        key = tuple(batch_img.shape)
        fn = self._jitted.get(key)
        if fn is None:
            model = self.model
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
                 quant_int8=False, act_scales=None):
    predictor = Predictor(config, checkpoint, quant_int8=quant_int8,
                          act_scales=act_scales)
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
    return p.parse_args(args)


def main(args=None):
    args = parse_args(args)
    scales = None
    if args.act_scales:
        scales = json.load(open(args.act_scales))
    server = build_server(args.config, args.checkpoint, args.host,
                          args.port, quant_int8=args.quant_int8,
                          act_scales=scales)
    print(f'serving on http://{args.host}:{server.server_address[1]}',
          file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == '__main__':
    main()
