#!/usr/bin/env python
"""Inference FPS benchmark (mirrors tools/analysis_tools/benchmark.py:64-92).

Measures pure model forward throughput with device sync, configurable
warmup/iters, on synthetic or real data.

  python tools/benchmark.py <config> [--warmup 5] [--iters 50] [--bf16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np  # noqa: E402

from common import build_model, load_cli_config  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--iters', type=int, default=50)
    p.add_argument('--bf16', action='store_true')
    p.add_argument('--batch', type=int, default=1,
                   help='scenes per step (vmap); throughput counts all')
    p.add_argument('--cfg-options', nargs='*', default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mv2d_tpu.core.geometry import prepare_camera_params
    sys.path.insert(0, os.path.abspath(os.path.join(
        os.path.dirname(__file__), os.pardir)))
    from __graft_entry__ import _rig

    cfg = load_cli_config(args.config, args.cfg_options)
    model = build_model(cfg)
    mc = model.cfg
    V = mc.total_views
    K, E = _rig(V, mc.image_size)
    ts = [0.0] * mc.num_views + [0.5] * (V - mc.num_views)
    cam = prepare_camera_params(K, E, timestamps=ts)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(V, *mc.image_size, 3)),
                       dtype=jnp.float32)
    shapes = jnp.asarray([[*mc.image_size]] * V)
    # materialize random params host-side from the eval_shape structure -
    # an eager init would crawl op-by-op over the device tunnel
    struct = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs, cam,
                            shapes)
    host_rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            host_rng.normal(0, 0.02, s.shape).astype(s.dtype)
            if np.issubdtype(s.dtype, np.floating)
            else np.zeros(s.shape, s.dtype)), struct)
    if args.bf16:
        cast = lambda x: x.astype(jnp.bfloat16) \
            if x.dtype == jnp.float32 else x
        variables = jax.tree.map(cast, variables)
        imgs = imgs.astype(jnp.bfloat16)
    B = args.batch
    if B > 1:
        imgs = jnp.broadcast_to(imgs[None], (B, *imgs.shape))
        fwd = jax.jit(jax.vmap(lambda i: model.apply(variables, i, cam,
                                                     shapes)))
        run = lambda: fwd(imgs)
    else:
        fwd = jax.jit(lambda v, i: model.apply(v, i, cam, shapes))
        run = lambda: fwd(variables, imgs)
    def force(out):
        # fetch one element: on the remote-TPU backend block_until_ready
        # acks enqueue rather than completion, so fetch a value
        return jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])

    force(run())
    for _ in range(args.warmup):
        force(run())
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run()
    force(out)
    dt = time.perf_counter() - t0
    print(f'{args.iters * B / dt:.3f} samples/s '
          f'({dt / args.iters / B * 1000:.1f} ms/sample, batch {B}, '
          f'{"bf16" if args.bf16 else "f32"}, {jax.devices()[0]})')


if __name__ == '__main__':
    main()
