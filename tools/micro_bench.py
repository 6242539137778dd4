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
        timed(fn, params, x, name='DCNv2 3x3 256ch @ 32x88 x12 (gather)')
        fnp = jax.jit(lambda p, y: mod.apply(p, y, use_pallas=True))
        timed(fnp, params, x, name='DCNv2 3x3 256ch @ 32x88 x12 (band)')

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

    if which in ('resnet_stages',):
        # where does the plain-R50 time go?  Time the stem and each stage
        # as separate jitted programs at their true input shapes.
        from flax import linen as fnn
        from mv2d_tpu.nn.layers import FrozenBatchNorm
        from mv2d_tpu.nn.resnet import Bottleneck

        def bench_module(mod, shape, name):
            y = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
            struct = jax.eval_shape(mod.init, jax.random.PRNGKey(0), y)
            params = jax.tree.map(
                lambda s: jnp.zeros(s.shape, jnp.bfloat16)
                if np.issubdtype(s.dtype, np.floating)
                else jnp.zeros(s.shape, s.dtype), struct)
            fn = jax.jit(lambda p, z: mod.apply(p, z))
            return timed(fn, params, y, name=name)

        class Stem(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                x = fnn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                             use_bias=False)(x)
                x = FrozenBatchNorm(64)(x)
                x = fnn.relu(x)
                return fnn.max_pool(x, (3, 3), strides=(2, 2),
                                    padding=[(1, 1)] * 2)

        class Stage(fnn.Module):
            planes: int
            n: int
            stride: int

            @fnn.compact
            def __call__(self, x):
                for i in range(self.n):
                    x = Bottleneck(self.planes,
                                   stride=self.stride if i == 0 else 1,
                                   downsample=(i == 0))(x)
                return x

        bench_module(Stem(), (12, 512, 1408, 3), 'stem 7x7/2 + maxpool')
        bench_module(Stage(64, 3, 1), (12, 128, 352, 64), 'stage1 3 blocks')
        bench_module(Stage(128, 4, 2), (12, 128, 352, 256), 'stage2 4 blk')
        bench_module(Stage(256, 6, 2), (12, 64, 176, 512), 'stage3 6 blk')
        bench_module(Stage(512, 3, 2), (12, 32, 88, 1024), 'stage4 3 blk')
        # MXU upper bound: the single heaviest conv class as one big matmul
        a = jnp.zeros((12 * 64 * 176, 1152), jnp.bfloat16)
        b = jnp.zeros((1152, 128), jnp.bfloat16)
        timed(jax.jit(lambda u, v: u @ v), a, b,
              name='matmul ~stage2 3x3 eq')

    if which in ('bottleneck', 'all'):
        # fused whole-block Pallas kernel vs plain XLA, identity blocks at
        # the backbone's true per-stage shapes (12 views @ 512x1408)
        from mv2d_tpu.nn.resnet import Bottleneck
        for planes, shape in ((64, (12, 128, 352, 256)),
                              (128, (12, 64, 176, 512)),
                              (256, (12, 32, 88, 1024)),
                              (512, (12, 16, 44, 2048))):
            y = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
            mod = Bottleneck(planes, fused=True)
            struct = jax.eval_shape(mod.init, jax.random.PRNGKey(0), y)
            params = jax.tree.map(
                lambda s: jnp.asarray(
                    rng.normal(0, 0.02, s.shape).astype(s.dtype)
                    if np.issubdtype(s.dtype, np.floating)
                    else np.zeros(s.shape, s.dtype)), struct)
            a = timed(jax.jit(lambda p, z: mod.apply(p, z)), params, y,
                      name=f'bottleneck p{planes} XLA')
            b = timed(jax.jit(
                lambda p, z: mod.apply(p, z, fast_inference=True)),
                params, y, name=f'bottleneck p{planes} fused')
            print(f'    -> {a / b:.2f}x')


if __name__ == '__main__':
    main()
