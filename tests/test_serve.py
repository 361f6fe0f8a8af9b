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


def test_micro_batcher_groups_and_scatters():
    """Concurrent requests group into one padded forward; each caller
    gets exactly its own image's result; a shape change breaks the
    group; errors propagate to every waiting caller."""
    import time
    import numpy as jnp_np
    import serve

    calls = []

    def slow_apply(variables, batch):
        calls.append(batch.shape)
        time.sleep(0.05)
        # identifiable per-image "probs": mean over pixels
        return batch.mean(axis=(1, 2, 3), keepdims=True), None

    mb = serve._MicroBatcher(slow_apply, max_batch=4, linger_ms=30.0)
    imgs = [np.full((1, 8, 8, 3), float(i), np.float32)
            for i in range(6)]
    results = [None] * 6

    def call(i):
        probs, _ = mb(None, imgs[i])
        results[i] = float(np.asarray(probs).ravel()[0])

    ts = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert results == [float(i) for i in range(6)], results
    assert max(mb.group_sizes) > 1, mb.group_sizes       # it batched
    assert sum(mb.group_sizes) == 6
    # padded groups compile only the max_batch shape (plus singles)
    assert all(s[0] in (1, 4) for s in calls), calls

    # shape change starts its own group
    other = np.zeros((1, 4, 4, 3), np.float32)
    t1 = threading.Thread(target=lambda: mb(None, imgs[0]))
    t2 = threading.Thread(target=lambda: mb(None, other))
    t1.start(); t2.start(); t1.join(30); t2.join(30)
    assert all(s[1] in (8, 4) for s in calls)

    # an apply error reaches every caller in the group
    def bad_apply(variables, batch):
        raise RuntimeError('boom')

    mbe = serve._MicroBatcher(bad_apply, max_batch=2, linger_ms=5.0)
    with pytest.raises(RuntimeError, match='boom'):
        mbe(None, imgs[0])


def test_serve_max_batch_http_roundtrip():
    """--max-batch server answers concurrent requests with the same
    label maps the serialized server produces."""
    import serve
    srv1 = serve.build_server(_test_cfg(), port=0, max_batch=1)
    srv4 = serve.build_server(_test_cfg(), port=0, max_batch=4)
    threads = []
    for srv in (srv1, srv4):
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        threads.append(t)
    try:
        rs = np.random.RandomState(9)
        imgs = [rs.randint(0, 255, (32, 32, 3), np.uint8)
                for _ in range(5)]
        bodies = []
        for im in imgs:
            ok, buf = cv2.imencode('.png', im)
            bodies.append(buf.tobytes())

        def post(port, body):
            req = urllib.request.Request(
                f'http://127.0.0.1:{port}/predictions/m',
                data=body, method='POST')
            with urllib.request.urlopen(req, timeout=180) as r:
                assert r.status == 200
                return cv2.imdecode(
                    np.frombuffer(r.read(), np.uint8),
                    cv2.IMREAD_UNCHANGED)

        p1 = srv1.server_address[1]
        ref = [post(p1, b) for b in bodies]

        p4 = srv4.server_address[1]
        out = [None] * len(bodies)

        def call(i):
            out[i] = post(p4, bodies[i])

        ts = [threading.Thread(target=call, args=(i,))
              for i in range(len(bodies))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        for r, o in zip(ref, out):
            np.testing.assert_array_equal(r, o)
    finally:
        srv1.shutdown()
        srv4.shutdown()


def test_serve_spatial_apply_returns_probabilities():
    """The spatial predictor path must hand PROBS to
    inference_segmentor (which sums outputs across TTA views), exactly
    like model.inference does on the plain path.  Regression: the
    spatial eval helper yields pre-softmax logits
    (``apis/test.py::make_spatial_inference_fn``), so the serve
    wrapper must re-apply softmax — raw logits here silently corrupt
    multi-view TTA averaging."""
    import jax.numpy as jnp
    import serve
    plain = serve.Predictor(_test_cfg())
    sp = serve.Predictor(_test_cfg(), spatial=8)
    sp.variables = plain.variables
    img = jnp.asarray(
        np.random.RandomState(3).rand(1, 40, 40, 3), jnp.float32)
    p_plain, _ = plain._apply_fn(plain.variables, img)
    p_sp, _ = sp._apply_fn(sp.variables, img)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(p_sp, axis=-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_sp), np.asarray(p_plain),
                               rtol=1e-4, atol=1e-5)


def test_serve_device_normalize_uint8_wire():
    """--device-normalize: request images cross the host->device link
    as uint8 (4x fewer bytes) and are normalized by a tiny jitted
    program on device; probabilities match the host-normalized
    predictor and the swapped pipeline really emits uint8 (regression
    guard on ImageToTensor preserving the wire dtype)."""
    import jax.numpy as jnp
    import serve
    from pfst_tpu.datasets.pipelines import Compose

    plain = serve.Predictor(_test_cfg())
    dn = serve.Predictor(_test_cfg(), device_normalize='uint8')
    dn.variables = plain.variables
    img = np.random.RandomState(7).randint(
        0, 255, (40, 40, 3)).astype(np.uint8)

    def run_pipe(pred):
        pipe = Compose(list(pred.model.cfg.data['test']['pipeline'])[1:])
        out = pipe(dict(img=img.copy(), img_shape=img.shape,
                        ori_shape=img.shape, img_fields=['img'],
                        seg_fields=[], filename=None,
                        ori_filename=None, scale_factor=1.0))
        return out['img']

    wire = run_pipe(dn)
    assert wire.dtype == np.uint8
    host = run_pipe(plain)
    assert host.dtype == np.float32

    p_host, _ = plain._apply_fn(plain.variables,
                                jnp.asarray(host)[None])
    p_wire, _ = dn._apply_fn(dn.variables, jnp.asarray(wire)[None])
    np.testing.assert_allclose(np.asarray(p_wire),
                               np.asarray(p_host),
                               rtol=1e-4, atol=1e-5)


def test_serve_device_normalize_nested_pipeline():
    """Shipped deploy configs nest Normalize inside
    MultiScaleFlipAug.transforms — the --device-normalize swap must
    find it there (regression: a top-level-only scan raised
    StopIteration at server startup on every real config)."""
    import serve
    cfg = _test_cfg()
    norm = cfg.data['test']['pipeline'][1]
    assert norm['type'] == 'Normalize'
    cfg.data['test']['pipeline'] = [
        cfg.data['test']['pipeline'][0],
        dict(type='MultiScaleFlipAug', img_scale=(40, 40), flip=False,
             transforms=[dict(norm),
                         dict(type='ImageToTensor', keys=['img'])]),
    ]
    pred = serve.Predictor(cfg, device_normalize='uint8')
    assert pred._dev_norm is not None
    swapped = cfg.data['test']['pipeline'][1]['transforms'][0]
    assert swapped['type'] == 'DeferNormalize'
    assert swapped['wire_dtype'] == 'uint8'

    # and a pipeline with no Normalize at all degrades to a warning,
    # not a crash (EO-style ClipNormalize pipelines)
    cfg2 = _test_cfg()
    cfg2.data['test']['pipeline'] = [
        t for t in cfg2.data['test']['pipeline']
        if t['type'] != 'Normalize']
    pred2 = serve.Predictor(cfg2, device_normalize='uint8')
    assert pred2._dev_norm is None


def test_serve_spatial_sharded_forward():
    """--spatial: each request's forward runs H-sharded over the mesh
    (huge-scene serving) and the label map matches the unsharded
    server's on the same input (40 divides by 8 -> no padding ->
    layout-only sharding)."""
    import serve
    srv_plain = serve.build_server(_test_cfg(), port=0)
    srv_sp = serve.build_server(_test_cfg(), port=0, spatial=8)
    for srv in (srv_plain, srv_sp):
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        rs = np.random.RandomState(5)
        body = _png(rs.randint(0, 255, (40, 40, 3), np.uint8))
        masks = []
        for srv in (srv_plain, srv_sp):
            url = (f'http://127.0.0.1:{srv.server_address[1]}'
                   '/predictions/m')
            status, out = _post(url, body)
            assert status == 200, out
            masks.append(cv2.imdecode(np.frombuffer(out, np.uint8),
                                      cv2.IMREAD_UNCHANGED))
        assert masks[0].shape == (40, 40)
        np.testing.assert_array_equal(masks[0], masks[1])
    finally:
        srv_plain.shutdown()
        srv_sp.shutdown()
