#!/usr/bin/env python
"""Micro-probes for the residual overhead stages (decode top-k, PE,
correlation internals) - all small fresh compiles.

  python tools/misc_bench.py [piece ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np


def timed(fn, *args, iters=20, name=''):
    import jax
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    for _ in range(3):
        fn(*args)
    jax.device_get(jax.tree.leaves(fn(*args))[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:46s} {dt * 1000:8.2f} ms', flush=True)
    return dt


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp

    pieces = sys.argv[1:] or ['topk', 'argsort', 'pe', 'corr']
    rng = np.random.default_rng(0)

    if 'topk' in pieces:
        x = jnp.asarray(rng.normal(size=(9000,)), jnp.float32)
        timed(jax.jit(lambda a: jax.lax.top_k(a, 300)), x,
              name='lax.top_k 9000 -> 300')
        timed(jax.jit(lambda a: jax.lax.top_k(a, 32)), x,
              name='lax.top_k 9000 -> 32')
        y = jnp.asarray(rng.normal(size=(33792,)), jnp.float32)
        timed(jax.jit(lambda a: jax.lax.top_k(a, 300)), y,
              name='lax.top_k 33792 -> 300')

    if 'argsort' in pieces:
        x = jnp.asarray(rng.normal(size=(9000,)), jnp.float32)
        timed(jax.jit(lambda a: jnp.argsort(-a)), x, name='argsort 9000')
        u = jnp.asarray(rng.uniform(size=(33792,)) < 0.3)
        timed(jax.jit(lambda a: jnp.argsort(~a, stable=True)), u,
              name='argsort(bool) 33792 (gather_active_keys)')

    if 'pe' in pieces:
        from mv2d_tpu.nn.pe import pos2posemb3d
        p = jnp.asarray(rng.uniform(size=(900, 3)), jnp.float32)
        timed(jax.jit(pos2posemb3d), p, name='pos2posemb3d 900')

    if 'corr' in pieces:
        # the [R, V, P, S*D] membership broadcast alone
        R, V, P, SD = 900, 12, 75, 128
        pts = jnp.asarray(rng.uniform(0, 1400, (R, V, SD, 2)), jnp.float32)
        ok = jnp.asarray(rng.uniform(size=(R, V, SD)) < 0.7)
        boxes = jnp.asarray(
            np.concatenate([rng.uniform(0, 1000, (V, P, 2)),
                            rng.uniform(1000, 1400, (V, P, 2))], -1),
            jnp.float32)

        def member(pts_, ok_, b_):
            b = b_[None, :, :, None]
            inb = (pts_[:, :, None, :, 0] >= b[..., 0]) & \
                  (pts_[:, :, None, :, 0] <= b[..., 2]) & \
                  (pts_[:, :, None, :, 1] >= b[..., 1]) & \
                  (pts_[:, :, None, :, 1] <= b[..., 3])
            inb &= ok_[:, :, None, :]
            return inb.any(-1)
        timed(jax.jit(member), pts, ok, boxes,
              name='corr membership [R,V,P,128] any')

        def member16(pts_, ok_, b_):
            # bf16 compare variant
            b = b_.astype(jnp.bfloat16)[None, :, :, None]
            q = pts_.astype(jnp.bfloat16)
            inb = (q[:, :, None, :, 0] >= b[..., 0]) & \
                  (q[:, :, None, :, 0] <= b[..., 2]) & \
                  (q[:, :, None, :, 1] >= b[..., 1]) & \
                  (q[:, :, None, :, 1] <= b[..., 3])
            inb &= ok_[:, :, None, :]
            return inb.any(-1)
        timed(jax.jit(member16), pts, ok, boxes,
              name='corr membership bf16 compares')


if __name__ == '__main__':
    main()
