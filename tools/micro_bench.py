#!/usr/bin/env python
"""Micro-benchmarks of suspected hot ops on the current backend.

  python tools/micro_bench.py [gather|align|nms|dcn|resnet|all]
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np


def timed(fn, *args, iters=10, name=''):
    import jax
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    for _ in range(2):
        fn(*args)
    jax.device_get(jax.tree.leaves(fn(*args))[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:34s} {dt * 1000:8.2f} ms', flush=True)
    return dt


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    rng = np.random.default_rng(0)

    if which in ('gather', 'all'):
        # raw row-gather throughput: 9.4M rows of 256 bf16 (the R-CNN
        # RoIAlign pattern)
        flat = jnp.asarray(rng.normal(size=(600000, 256)), jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, 600000, (12000, 196)), jnp.int32)

        def g(f, i):
            return f[i].sum(axis=1)

        dt = timed(jax.jit(g), flat, idx, name='row gather 2.35M x 256 bf16')
        gb = 12000 * 196 * 256 * 2 / 1e9
        print(f'    -> effective gather bw {gb / dt:.1f} GB/s')

    if which in ('align', 'all'):
        from mv2d_tpu.ops.roi_align import multilevel_roi_align
        feats = [jnp.asarray(rng.normal(size=(12, 512 // s, 1408 // s, 256)),
                             jnp.bfloat16) for s in (4, 8, 16, 32)]
        rois = jnp.asarray(
            np.concatenate([rng.uniform(0, 1000, (12000, 2)),
                            rng.uniform(100, 400, (12000, 2))], 1),
            jnp.float32)
        rois = rois.at[:, 2:].add(rois[:, :2])
        views = jnp.asarray(rng.integers(0, 12, 12000), jnp.int32)
        fn = jax.jit(lambda f, r, v: multilevel_roi_align(
            f, r, v, (4, 8, 16, 32)))
        timed(fn, feats, rois, views, name='multilevel_roi_align 12k rois')


    if which in ('palign', 'all2'):
        from mv2d_tpu.ops.pallas_roi_align import pallas_multilevel_roi_align
        feats = [jnp.asarray(rng.normal(size=(12, 512 // s, 1408 // s, 256)),
                             jnp.bfloat16) for s in (4, 8, 16, 32)]
        rois = jnp.asarray(
            np.concatenate([rng.uniform(0, 1000, (12000, 2)),
                            rng.uniform(100, 400, (12000, 2))], 1),
            jnp.float32)
        rois = rois.at[:, 2:].add(rois[:, :2])
        views = jnp.asarray(rng.integers(0, 12, 12000), jnp.int32)
        fn = jax.jit(lambda f, r, v: pallas_multilevel_roi_align(
            f, r, v, (4, 8, 16, 32)))
        timed(fn, feats, rois, views, name='PALLAS roi_align 12k rois')

    if which in ('nms', 'all'):
        from mv2d_tpu.core.nms import nms_padded
        boxes = jnp.asarray(np.concatenate(
            [rng.uniform(0, 1300, (12, 4544, 2)),
             rng.uniform(20, 200, (12, 4544, 2))], -1), jnp.float32)
        boxes = boxes.at[..., 2:].add(boxes[..., :2])
        scores = jnp.asarray(rng.uniform(0, 1, (12, 4544)), jnp.float32)
        valid = jnp.ones((12, 4544), bool)
        fn = jax.jit(jax.vmap(
            lambda b, s, v: nms_padded(b, s, v, 0.7, 1000)))
        timed(fn, boxes, scores, valid, name='RPN NMS 12x4544')

    if which in ('dcn', 'all'):
        from mv2d_tpu.ops.dcn import ModulatedDeformConv
        x = jnp.asarray(rng.normal(size=(12, 32, 88, 256)), jnp.bfloat16)
        mod = ModulatedDeformConv(features=256)
        params = jax.tree.map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16),
            jax.eval_shape(mod.init, jax.random.PRNGKey(0), x))
        fn = jax.jit(lambda p, y: mod.apply(p, y))
        timed(fn, params, x, name='DCNv2 3x3 256ch @ 32x88 x12')

    if which in ('resnet', 'all'):
        from mv2d_tpu.nn.resnet import ResNet
        x = jnp.asarray(rng.normal(size=(12, 512, 1408, 3)), jnp.bfloat16)
        for dcn in (False, True):
            model = ResNet(depth=50,
                           stage_with_dcn=(False, False, dcn, dcn))
            struct = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
            params = jax.tree.map(
                lambda s: jnp.zeros(s.shape, jnp.bfloat16)
                if np.issubdtype(s.dtype, np.floating)
                else jnp.zeros(s.shape, s.dtype), struct)
            fn = jax.jit(lambda p, y: model.apply(p, y))
            timed(fn, params, x, name=f'ResNet50 12x512x1408 dcn={dcn}')


if __name__ == '__main__':
    main()
