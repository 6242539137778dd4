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


def wfold_main():
    """W-pair fold (factor 2): [V, H, W, C] -> [V, H, W/2, 2C] is a PURE
    RESHAPE (flat (w, c) order == (wp, i, c)); a stride-1 3x3 conv becomes
    an exact 3x3 conv on the folded grid with a half-sparse [3, 3, 2C, 2C]
    kernel: 2x dense FLOPs for 2x the contraction depth AND 2x output
    lanes.  (The earlier 2x2 fold paid 4x FLOPs and still ran at 4x
    better per-FLOP rate - docs/PERF.md - so 2x inflation should win.)"""
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def wfold_kernel(k):
        """[3, 3, C, Co] -> [3, 3, 2C, 2Co] exact W-pair fold."""
        k = np.asarray(k, np.float32)
        _, _, C, Co = k.shape
        kf = np.zeros((3, 3, 2, C, 2, Co), np.float32)
        for dq in (-1, 0, 1):          # folded col offset
            for i in (0, 1):           # input parity
                for j in (0, 1):       # output parity
                    dx = 2 * dq + i - j + 1
                    if 0 <= dx <= 2:
                        kf[:, dq + 1, i, :, j, :] = k[:, dx]
        return kf.reshape(3, 3, 2 * C, 2 * Co)

    def wfold_kernel_1x1(k):
        k = np.asarray(k, np.float32)
        _, _, C, Co = k.shape
        kf = np.zeros((1, 1, 2, C, 2, Co), np.float32)
        kf[0, 0, 0, :, 0, :] = k[0, 0]
        kf[0, 0, 1, :, 1, :] = k[0, 0]
        return kf.reshape(1, 1, 2 * C, 2 * Co)

    for (V, H, W, C, Co) in [(12, 128, 352, 64, 64),
                             (12, 64, 176, 128, 128),
                             (12, 32, 88, 256, 256)]:
        x = jnp.asarray(rng.normal(size=(V, H, W, C)), jnp.bfloat16)
        w33 = jnp.asarray(rng.normal(size=(3, 3, C, Co)) * 0.05,
                          jnp.bfloat16)

        def conv(x, w, dims=None):
            dnn = lax.conv_dimension_numbers(x.shape, w.shape,
                                             ('NHWC', 'HWIO', 'NHWC'))
            return lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                            dimension_numbers=dnn)

        def conv_wfold(x, wf):
            xf = x.reshape(V, H, W // 2, 2 * C)
            return conv(xf, wf).reshape(V, H, W, Co)

        wf = jnp.asarray(wfold_kernel(w33), jnp.bfloat16)
        timed(jax.jit(conv), x, w33,
              name=f'3x3 {C}->{Co} @{H}x{W} XLA')
        timed(jax.jit(conv_wfold), x, wf,
              name=f'3x3 {C}->{Co} @{H}x{W} W-fold2')
        if C == 64:
            ref = np.asarray(jax.jit(conv)(x.astype(jnp.float32),
                                           w33.astype(jnp.float32)))
            got = np.asarray(jax.jit(conv_wfold)(
                x.astype(jnp.float32),
                jnp.asarray(wfold_kernel(w33), jnp.float32)))
            err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
            print(f'  wfold rel err: {err:.2e}', flush=True)

    # whole stage-1 bottleneck chain W-folded end-to-end (the residual
    # and relus are elementwise, so the WHOLE stage can stay folded with
    # ONE free reshape in and out)
    V, H, W, C = 12, 128, 352, 64
    x256 = jnp.asarray(rng.normal(size=(V, H, W, 256)), jnp.bfloat16)
    wa = jnp.asarray(rng.normal(size=(1, 1, 256, 64)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    wc = jnp.asarray(rng.normal(size=(1, 1, 64, 256)) * 0.05, jnp.bfloat16)

    def conv_any(x, w):
        dnn = lax.conv_dimension_numbers(x.shape, w.shape,
                                         ('NHWC', 'HWIO', 'NHWC'))
        return lax.conv_general_dilated(x, w, (1, 1), 'SAME',
                                        dimension_numbers=dnn)

    def block_xla(x, wa, w2, wc):
        h = jax.nn.relu(conv_any(x, wa))
        h = jax.nn.relu(conv_any(h, w2))
        return jax.nn.relu(conv_any(h, wc) + x)

    waf = jnp.asarray(wfold_kernel_1x1(wa), jnp.bfloat16)
    w2f = jnp.asarray(wfold_kernel(w2), jnp.bfloat16)
    wcf = jnp.asarray(wfold_kernel_1x1(wc), jnp.bfloat16)

    def block_wfold(x, waf, w2f, wcf):
        xf = x.reshape(V, H, W // 2, 512)
        h = jax.nn.relu(conv_any(xf, waf))
        h = jax.nn.relu(conv_any(h, w2f))
        return jax.nn.relu(conv_any(h, wcf) + xf).reshape(V, H, W, 256)

    def block_hybrid(x, wa, w2f, wc):
        # fold ONLY the 3x3: the 1x1s are already K>=128-efficient and
        # block-diag folding just doubles their FLOPs (measured 8.61 ms
        # vs 4.62 XLA for the all-folded block)
        h = jax.nn.relu(conv_any(x, wa))
        hf = h.reshape(V, H, W // 2, 128)
        hf = jax.nn.relu(conv_any(hf, w2f))
        h = hf.reshape(V, H, W, 64)
        return jax.nn.relu(conv_any(h, wc) + x)

    timed(jax.jit(block_xla), x256, wa, w2, wc,
          name='bottleneck(256-64-256) XLA')
    timed(jax.jit(block_wfold), x256, waf, w2f, wcf,
          name='bottleneck(256-64-256) W-fold2')
    timed(jax.jit(block_hybrid), x256, wa, w2f, wc,
          name='bottleneck(256-64-256) fold conv2 only')
    ref = np.asarray(jax.jit(block_xla)(
        x256.astype(jnp.float32), wa.astype(jnp.float32),
        w2.astype(jnp.float32), wc.astype(jnp.float32)))
    got = np.asarray(jax.jit(block_hybrid)(
        x256.astype(jnp.float32), wa.astype(jnp.float32),
        jnp.asarray(wfold_kernel(w2)), wc.astype(jnp.float32)))
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
    print(f'  hybrid wfold rel err: {err:.2e}', flush=True)
    ref = np.asarray(jax.jit(block_xla)(
        x256.astype(jnp.float32), wa.astype(jnp.float32),
        w2.astype(jnp.float32), wc.astype(jnp.float32)))
    got = np.asarray(jax.jit(block_wfold)(
        x256.astype(jnp.float32), jnp.asarray(wfold_kernel_1x1(wa)),
        jnp.asarray(wfold_kernel(w2)), jnp.asarray(wfold_kernel_1x1(wc))))
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
    print(f'  block wfold rel err: {err:.2e}', flush=True)


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
    if 'wfold' in sys.argv:
        wfold_main()
    else:
        main()
