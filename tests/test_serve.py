"""HTTP model server (`tools/serve.py`) — the torchserve-equivalent
surface (reference ``tools/torchserve/mmseg_handler.py``)."""
import base64
import os.path as osp
import sys
import threading
import urllib.request

import cv2
import numpy as np
import pytest

from pfst_tpu.utils.config import Config

from conftest import tiny_model_cfg

sys.path.insert(0, osp.join(osp.dirname(__file__), '..', 'tools'))


def _test_cfg():
    return Config(dict(
        model=tiny_model_cfg(),
        data=dict(test=dict(pipeline=[
            dict(type='LoadImageFromFile'),
            dict(type='Normalize', mean=[127.5] * 3, std=[127.5] * 3,
                 to_rgb=True),
            dict(type='ImageToTensor', keys=['img']),
        ])),
    ))


@pytest.fixture(scope='module')
def server():
    import serve
    srv = serve.build_server(_test_cfg(), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f'http://127.0.0.1:{srv.server_address[1]}'
    srv.shutdown()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method='POST')
    try:
        resp = urllib.request.urlopen(req, timeout=120)
        return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _png(arr):
    ok, buf = cv2.imencode('.png', arr)
    assert ok
    return buf.tobytes()


def test_ping(server):
    with urllib.request.urlopen(server + '/ping', timeout=30) as r:
        assert r.status == 200
        assert b'Healthy' in r.read()


def test_predict_png_roundtrip(server):
    img = np.random.RandomState(0).randint(
        0, 255, (32, 32, 3), np.uint8)
    status, body = _post(server + '/predictions/m', _png(img))
    assert status == 200, body
    mask = cv2.imdecode(np.frombuffer(body, np.uint8),
                        cv2.IMREAD_UNCHANGED)
    assert mask.shape == (32, 32)
    assert mask.max() < 6  # trainIds for the 6-class tiny model


def test_predict_base64_body(server):
    img = np.random.RandomState(1).randint(
        0, 255, (32, 32, 3), np.uint8)
    status, body = _post(server + '/predictions/m',
                         base64.b64encode(_png(img)))
    assert status == 200, body
    mask = cv2.imdecode(np.frombuffer(body, np.uint8),
                        cv2.IMREAD_UNCHANGED)
    assert mask.shape == (32, 32)


def test_predict_render_overlay(server):
    img = np.random.RandomState(2).randint(
        0, 255, (32, 32, 3), np.uint8)
    status, body = _post(server + '/predictions/m?render=1', _png(img))
    assert status == 200, body
    overlay = cv2.imdecode(np.frombuffer(body, np.uint8),
                           cv2.IMREAD_UNCHANGED)
    assert overlay.shape == (32, 32, 3)


def test_bad_request(server):
    status, body = _post(server + '/predictions/m', b'not an image')
    assert status == 400
    assert b'error' in body


def test_deterministic_across_requests(server):
    img = np.random.RandomState(3).randint(
        0, 255, (32, 32, 3), np.uint8)
    _, b1 = _post(server + '/predictions/m', _png(img))
    _, b2 = _post(server + '/predictions/m', _png(img))
    assert b1 == b2


def test_serve_quant_int8_roundtrip():
    """--quant-int8 serving: the int8-traced program answers requests
    and (here, with a random-init tiny model) returns a valid label
    map; act_scales plumb through build_server."""
    import serve
    srv = serve.build_server(_test_cfg(), port=0, quant_int8=True,
                             act_scales={'no/such/layer': 1.0})
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f'http://127.0.0.1:{srv.server_address[1]}'
        img = np.random.RandomState(3).randint(
            0, 255, (32, 32, 3), np.uint8)
        ok, buf = cv2.imencode('.png', img)
        req = urllib.request.Request(url + '/predictions/m',
                                     data=buf.tobytes(), method='POST')
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            body = r.read()
        mask = cv2.imdecode(np.frombuffer(body, np.uint8),
                            cv2.IMREAD_UNCHANGED)
        assert mask.shape == (32, 32) and mask.max() < 6
    finally:
        srv.shutdown()
