#!/usr/bin/env python
"""Online serving harness (replaces the reference's torchserve deployment,
ref: tools/deployment/{mmdet3d2torchserve,mmdet3d_handler}.py).

TPU-first design: requests are queued and dispatched in dynamically-formed
batches of up to --max-batch scenes, each PIPELINED through the one
compiled single-scene program (JAX async dispatch overlaps host work with
device steps).  One program serves every batch size - no per-bucket
recompiles, no padding, and unlike a scene-vmapped program the batch keeps
the Pallas kernel fast path (vmap cannot batch kernels that use manual
DMA/ANY memory spaces, so vmapped buckets forced the slower pure-XLA
routing; the device is ~fully busy on one scene, so batching adds
throughput only via pipelining anyway).

  python tools/serve.py <config> [--checkpoint CKPT] [--port 8300]
      [--max-batch 4] [--batch-timeout-ms 8] [--no-warmup]

Protocol (stdlib-only, no deps):
  GET  /health    -> {"status": "ok"}
  GET  /metadata  -> model/preset info
  GET  /metrics   -> request counts + latency stats (ms)
  POST /predict   -> body: .npz with arrays
        images      [V, H, W, 3] float  (normalized, view-major)
        intrinsics  [V, 4, 4]
        extrinsics  [V, 4, 4]  (lidar->cam)
        timestamps  [V]        (optional, zeros if absent)
      response: .npz with boxes_3d [N, 9], scores_3d [N], labels_3d [N],
      valid [N]  (fixed N = cfg.max_per_scene slots; filter by `valid`).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np  # noqa: E402

from common import build_model, load_cli_config  # noqa: E402


class _Request:
    __slots__ = ('arrays', 'event', 'result', 'error', 't_enqueue')

    def __init__(self, arrays):
        self.arrays = arrays
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.t_enqueue = time.perf_counter()


class ModelRunner:
    """Owns the compiled forward and the pipelining dispatcher."""

    def __init__(self, cfg: dict, checkpoint: str | None, max_batch: int,
                 batch_timeout_ms: float, warmup: bool = True):
        import jax
        import jax.numpy as jnp
        from mv2d_tpu.core.geometry import prepare_camera_params
        from __graft_entry__ import _rig

        self.jax = jax
        self.model = build_model(cfg)
        mc = self.model.cfg
        self.mc = mc
        V = mc.total_views
        self.max_batch = max(1, max_batch)
        self.batch_timeout = batch_timeout_ms / 1e3
        self.queue: queue.Queue[_Request] = queue.Queue()
        self.metrics = {'requests': 0, 'errors': 0, 'batches': 0,
                        'latency_ms': []}
        self._metrics_lock = threading.Lock()

        K, E = _rig(V, mc.image_size)
        ts = [0.0] * mc.num_views + [0.5] * (V - mc.num_views)
        cam0 = prepare_camera_params(K, E, timestamps=ts)
        imgs0 = jnp.zeros((V, *mc.image_size, 3), jnp.float32)
        shapes0 = jnp.asarray([[*mc.image_size]] * V)
        variables = jax.jit(self.model.init)(
            jax.random.PRNGKey(0), imgs0, cam0, shapes0)
        if checkpoint:
            from mv2d_tpu.train.checkpoint import restore_checkpoint
            variables = restore_checkpoint(checkpoint, variables)
        self.variables = variables
        self._prepare_cam = prepare_camera_params

        def fwd(imgs, cam, shapes):
            return self.model.apply(self.variables, imgs, cam, shapes)

        self._fwd = jax.jit(fwd)
        if warmup:
            self._run_batch([(imgs0, cam0, shapes0)])
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._dispatcher.start()

    # ------------------------------------------------------------ batching

    def _run_batch(self, samples):
        # dispatch every scene before fetching any result: the async
        # runtime queues them back-to-back on the device
        outs = [self._fwd(*s) for s in samples]
        return [self.jax.device_get(o) for o in outs]

    def _dispatch_loop(self):
        while True:
            first = self.queue.get()
            if first is None:
                return
            batch = [first]
            deadline = time.perf_counter() + self.batch_timeout
            while len(batch) < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=left))
                except queue.Empty:
                    break
            try:
                samples = [self._to_sample(r.arrays) for r in batch]
                outs = self._run_batch(samples)
                now = time.perf_counter()
                for r, out in zip(batch, outs):
                    boxes, scores, labels, valid = (
                        np.asarray(x) for x in self.jax.tree.leaves(out)[:4])
                    r.result = dict(boxes_3d=boxes, scores_3d=scores,
                                    labels_3d=labels, valid=valid)
                    r.event.set()
                with self._metrics_lock:
                    self.metrics['batches'] += 1
                    self.metrics['latency_ms'].extend(
                        (now - r.t_enqueue) * 1e3 for r in batch)
                    del self.metrics['latency_ms'][:-1000]
            except Exception as e:  # noqa: BLE001 - report to the client
                for r in batch:
                    r.error = f'{type(e).__name__}: {e}'
                    r.event.set()
                with self._metrics_lock:
                    self.metrics['errors'] += len(batch)

    def _to_sample(self, arrays):
        jnp = self.jax.numpy
        mc = self.mc
        V = mc.total_views
        imgs = np.asarray(arrays['images'], np.float32)
        if imgs.shape != (V, *mc.image_size, 3):
            raise ValueError(
                f'images must be [{V}, {mc.image_size[0]}, '
                f'{mc.image_size[1]}, 3], got {list(imgs.shape)}')
        intr = np.asarray(arrays['intrinsics'], np.float64)
        extr = np.asarray(arrays['extrinsics'], np.float64)
        ts = np.asarray(arrays.get('timestamps', np.zeros(V)), np.float64)
        cam = self._prepare_cam(intr, extr, timestamps=list(ts))
        shapes = jnp.asarray([[*mc.image_size]] * V)
        return jnp.asarray(imgs), cam, shapes

    # ------------------------------------------------------------- client

    def predict(self, arrays, timeout=120.0):
        req = _Request(arrays)
        with self._metrics_lock:
            self.metrics['requests'] += 1
        self.queue.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError('inference timed out')
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def snapshot_metrics(self):
        with self._metrics_lock:
            lat = sorted(self.metrics['latency_ms'])
            pct = (lambda p: round(lat[min(len(lat) - 1,
                                           int(p * len(lat)))], 2)
                   if lat else None)
            return {
                'requests': self.metrics['requests'],
                'errors': self.metrics['errors'],
                'batches': self.metrics['batches'],
                'latency_ms_p50': pct(0.50),
                'latency_ms_p90': pct(0.90),
                'latency_ms_p99': pct(0.99),
            }


def make_handler(runner: ModelRunner, meta: dict):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body: bytes, ctype='application/json'):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code, obj):
            self._send(code, json.dumps(obj).encode())

        def do_GET(self):
            if self.path == '/health':
                self._json(200, {'status': 'ok'})
            elif self.path == '/metadata':
                self._json(200, meta)
            elif self.path == '/metrics':
                self._json(200, runner.snapshot_metrics())
            else:
                self._json(404, {'error': 'not found'})

        def do_POST(self):
            if self.path != '/predict':
                self._json(404, {'error': 'not found'})
                return
            try:
                n = int(self.headers.get('Content-Length', 0))
                arrays = dict(np.load(io.BytesIO(self.rfile.read(n)),
                                      allow_pickle=False))
                out = runner.predict(arrays)
            except Exception as e:  # noqa: BLE001
                self._json(400, {'error': f'{type(e).__name__}: {e}'})
                return
            buf = io.BytesIO()
            np.savez(buf, **out)
            self._send(200, buf.getvalue(), 'application/x-npz')

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8300)
    p.add_argument('--max-batch', type=int, default=4)
    p.add_argument('--batch-timeout-ms', type=float, default=8.0)
    p.add_argument('--no-warmup', action='store_true')
    p.add_argument('--cfg-options', nargs='*', default=None)
    args = p.parse_args()

    cfg = load_cli_config(args.config, args.cfg_options)
    runner = ModelRunner(cfg, args.checkpoint, args.max_batch,
                         args.batch_timeout_ms, warmup=not args.no_warmup)
    mc = runner.mc
    meta = {'preset': cfg['model'].get('preset'),
            'views': mc.total_views, 'image_size': list(mc.image_size),
            'classes': mc.num_classes, 'max_per_scene': mc.max_per_scene,
            'max_batch': runner.max_batch}

    from http.server import ThreadingHTTPServer
    srv = ThreadingHTTPServer((args.host, args.port),
                              make_handler(runner, meta))
    print(f'serving on http://{args.host}:{srv.server_address[1]} '
          f'(max batch {runner.max_batch})', flush=True)
    srv.serve_forever()


if __name__ == '__main__':
    main()
