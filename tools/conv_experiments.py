#!/usr/bin/env python
"""Standalone experiments on the backbone small-C conv wall (layer1 shapes).

Reference shapes: R50 layer1 on 12 views @ 512x1408 -> [12, 128, 352, 64].
XLA in-net runs these at 7-15% MXU (docs/PERF.md). Tries:
  - 1x1 convs as conv_general vs reshape+dot
  - 3x3 conv as conv_general (NHWC / NCHW) vs dense space-to-depth fold
    (2x2 fold -> K=4 taps x 256, 16/9 FLOP inflation but full MXU tiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np


def timed(fn, *args, iters=20, name=''):
    import jax
    out = jax.block_until_ready(fn(*args))
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    for _ in range(3):
        fn(*args)
    jax.device_get(jax.tree.leaves(fn(*args))[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:44s} {dt * 1000:8.2f} ms', flush=True)
    return dt


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    V, H, W, C = 12, 128, 352, 64
    x = jnp.asarray(rng.normal(size=(V, H, W, C)), jnp.bfloat16)
    w11_256 = jnp.asarray(rng.normal(size=(1, 1, C, 256)) * 0.05,
                          jnp.bfloat16)
    w33 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)

    dn = lambda lhs, rhs: lax.conv_dimension_numbers(
        lhs, rhs, ('NHWC', 'HWIO', 'NHWC'))

    # --- 1x1 conv 64->256 ---
    def conv11(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                        dimension_numbers=dn(x.shape, w.shape))

    def dot11(x, w):
        return (x.reshape(-1, C) @ w.reshape(C, 256)).reshape(
            V, H, W, 256)

    timed(jax.jit(conv11), x, w11_256, name='1x1 64->256 conv_general NHWC')
    timed(jax.jit(dot11), x, w11_256, name='1x1 64->256 reshape+dot')

    # --- 3x3 conv 64->64 SAME ---
    def conv33(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                        dimension_numbers=dn(x.shape, w.shape))

    timed(jax.jit(conv33), x, w33, name='3x3 64->64 conv_general NHWC')

    # NCHW variant
    xc = jnp.transpose(x, (0, 3, 1, 2))
    wc = jnp.transpose(w33, (3, 2, 0, 1))  # OIHW

    def conv33_nchw(x, w):
        dnn = lax.conv_dimension_numbers(x.shape, w.shape,
                                         ('NCHW', 'OIHW', 'NCHW'))
        return lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                        dimension_numbers=dnn)

    timed(jax.jit(conv33_nchw), xc, wc, name='3x3 64->64 conv_general NCHW')

    # --- dense s2d-folded 3x3 (exact): fold 2x2 -> [V, H/2, W/2, 4C];
    # a stride-1 3x3 conv on the original grid == a 3x3 conv on the folded
    # grid with dense [3,3,4C,4C] weights assembled from w33 (zeros where a
    # folded tap/phase pair doesn't correspond to one of the 9 taps; 4x
    # FLOP inflation traded for full-tile K=36C contraction).
    def fold_weights(w):
        w = np.asarray(w, np.float32)  # [3,3,C,C]
        wf = np.zeros((3, 3, 4, C, 4, C), np.float32)  # [fy,fx,pin,C,pout,C]
        for pout_y in range(2):
            for pout_x in range(2):
                pout = pout_y * 2 + pout_x
                for ty in range(3):
                    for tx in range(3):
                        # original input row = 2*y + pout_y + ty - 1
                        ry, rx = pout_y + ty - 1, pout_x + tx - 1
                        fy, pin_y = divmod(ry, 2)
                        fx, pin_x = divmod(rx, 2)
                        pin = pin_y * 2 + pin_x
                        wf[fy + 1, fx + 1, pin, :, pout, :] = w[ty, tx]
        return jnp.asarray(wf.reshape(3, 3, 4 * C, 4 * C), jnp.bfloat16)

    wfold = fold_weights(w33)

    def conv33_folded(x, wf):
        xf = x.reshape(V, H // 2, 2, W // 2, 2, C).transpose(
            0, 1, 3, 2, 4, 5).reshape(V, H // 2, W // 2, 4 * C)
        dnn = lax.conv_dimension_numbers(xf.shape, wf.shape,
                                         ('NHWC', 'HWIO', 'NHWC'))
        yf = lax.conv_general_dilated(xf, wf, (1, 1), 'SAME',
                                      dimension_numbers=dnn)
        y = yf.reshape(V, H // 2, W // 2, 2, 2, C).transpose(
            0, 1, 3, 2, 4, 5).reshape(V, H, W, C)
        return y

    timed(jax.jit(conv33_folded), x, wfold, name='3x3 64->64 dense s2d-fold')

    # correctness of the fold
    ref = np.asarray(jax.jit(conv33)(x.astype(jnp.float32),
                                     w33.astype(jnp.float32)))
    got = np.asarray(jax.jit(conv33_folded)(
        x.astype(jnp.float32), fold_weights(w33).astype(jnp.float32)))
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
    print(f'fold rel err: {err:.2e}')

    # whole bottleneck: conv1(1x1,64->64) relu conv2(3x3) relu
    # conv3(1x1,64->256) + residual-proj, as XLA convs vs dot/fold forms
    w11a = jnp.asarray(rng.normal(size=(1, 1, 64, 64)) * 0.05, jnp.bfloat16)

    def bottleneck_xla(x, wa, w2, wc):
        h = jax.nn.relu(conv11_g(x, wa))
        h = jax.nn.relu(conv33(h, w2))
        return conv11(h, wc)

    def conv11_g(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                        dimension_numbers=dn(x.shape, w.shape))

    def bottleneck_dots(x, wa, w2f, wc):
        h = jax.nn.relu(x.reshape(-1, 64) @ wa.reshape(64, 64))
        h = jax.nn.relu(conv33_folded(h.reshape(V, H, W, 64), w2f))
        return (h.reshape(-1, 64) @ wc.reshape(64, 256)).reshape(
            V, H, W, 256)

    timed(jax.jit(bottleneck_xla), x, w11a, w33, w11_256,
          name='bottleneck XLA convs')
    timed(jax.jit(bottleneck_dots), x, w11a, wfold, w11_256,
          name='bottleneck dots + s2d-fold')


if __name__ == '__main__':
    main()
