"""Serving harness: dynamic batching, HTTP protocol, error paths."""
import io
import json
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(REPO, 'tools'))


@pytest.fixture(scope='module')
def served():
    from http.server import ThreadingHTTPServer
    from serve import ModelRunner, make_handler

    cfg = {'model': {'preset': 'tiny', 'overrides': {'num_views': 6}}}
    runner = ModelRunner(cfg, checkpoint=None, max_batch=2,
                         batch_timeout_ms=30.0, warmup=False)
    meta = {'preset': 'tiny', 'views': runner.mc.total_views,
            'image_size': list(runner.mc.image_size)}
    srv = ThreadingHTTPServer(('127.0.0.1', 0), make_handler(runner, meta))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield runner, f'http://127.0.0.1:{srv.server_address[1]}'
    srv.shutdown()


def _payload(mc):
    from __graft_entry__ import _rig
    V = mc.total_views
    K, E = _rig(V, mc.image_size)
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    np.savez(buf,
             images=rng.normal(size=(V, *mc.image_size, 3)).astype(
                 np.float32),
             intrinsics=np.asarray(K), extrinsics=np.asarray(E),
             timestamps=np.zeros(V))
    return buf.getvalue()


def test_health_and_metadata(served):
    _, url = served
    with urllib.request.urlopen(url + '/health') as r:
        assert json.load(r)['status'] == 'ok'
    with urllib.request.urlopen(url + '/metadata') as r:
        assert json.load(r)['preset'] == 'tiny'


def test_predict_http_roundtrip(served):
    runner, url = served
    req = urllib.request.Request(url + '/predict', data=_payload(runner.mc),
                                 method='POST')
    with urllib.request.urlopen(req, timeout=300) as r:
        out = dict(np.load(io.BytesIO(r.read())))
    n = runner.mc.max_per_scene
    assert out['boxes_3d'].shape == (n, 9)
    assert out['scores_3d'].shape == (n,)
    assert out['labels_3d'].shape == (n,)
    assert out['valid'].shape == (n,)
    assert np.isfinite(out['boxes_3d'][out['valid'].astype(bool)]).all()


def test_concurrent_requests_batch(served):
    runner, url = served
    payload = _payload(runner.mc)
    results, errors = [], []

    def post():
        try:
            req = urllib.request.Request(url + '/predict', data=payload,
                                         method='POST')
            with urllib.request.urlopen(req, timeout=300) as r:
                results.append(dict(np.load(io.BytesIO(r.read()))))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=post) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(results) == 3
    # identical inputs -> identical outputs regardless of batch packing
    for out in results[1:]:
        np.testing.assert_allclose(out['boxes_3d'], results[0]['boxes_3d'],
                                   rtol=2e-2, atol=2e-2)
    m = runner.snapshot_metrics()
    assert m['requests'] >= 4 and m['errors'] == 0


def test_bad_request(served):
    runner, url = served
    buf = io.BytesIO()
    np.savez(buf, images=np.zeros((2, 8, 8, 3), np.float32),
             intrinsics=np.eye(4)[None], extrinsics=np.eye(4)[None])
    req = urllib.request.Request(url + '/predict', data=buf.getvalue(),
                                 method='POST')
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
