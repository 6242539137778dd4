import jax
import jax.numpy as jnp
import numpy as np

from mv2d_tpu.ops import attention, roi_align
from mv2d_tpu.ops.dcn import ModulatedDeformConv


def np_roi_align(feat, roi, scale, out=7, samp=2):
    """Numpy oracle for aligned RoIAlign (single view, channels-last).

    samp <= 0 = mmcv's adaptive rule (the reference configs use
    sampling_ratio=-1 / 0): per-axis sample count = ceil(bin size),
    count = max(gy * gx, 1) as in mmcv's CUDA kernel."""
    H, W, C = feat.shape

    def bil(y, x):
        if x < -1 or x > W or y < -1 or y > H:
            return np.zeros(C)
        x = min(max(x, 0), W - 1)
        y = min(max(y, 0), H - 1)
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        x1, y1 = min(x0 + 1, W - 1), min(y0 + 1, H - 1)
        lx, ly = x - x0, y - y0
        return (feat[y0, x0] * (1 - ly) * (1 - lx) + feat[y0, x1] * (1 - ly) * lx
                + feat[y1, x0] * ly * (1 - lx) + feat[y1, x1] * ly * lx)

    x1, y1, x2, y2 = [v * scale - 0.5 for v in roi]
    bw, bh = (x2 - x1) / out, (y2 - y1) / out
    if samp > 0:
        gy = gx = samp
    else:
        gy = int(np.ceil(np.float32(bh)))
        gx = int(np.ceil(np.float32(bw)))
    count = max(gy * gx, 1)
    res = np.zeros((out, out, C))
    for i in range(out):
        for j in range(out):
            acc = np.zeros(C)
            for si in range(gy):
                for sj in range(gx):
                    yy = y1 + (i + (si + 0.5) / gy) * bh
                    xx = x1 + (j + (sj + 0.5) / gx) * bw
                    acc += bil(yy, xx)
            res[i, j] = acc / count
    return res


def test_roi_align_matches_oracle(rng):
    feat = rng.normal(size=(2, 16, 24, 4)).astype(np.float32)
    rois = np.asarray([[10., 5., 80., 50.], [0., 0., 30., 30.],
                       [40., 20., 90., 60.]], np.float32)
    views = np.asarray([0, 1, 1], np.int32)
    out = roi_align.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                              jnp.asarray(views), spatial_scale=0.25,
                              output_size=7, sampling_ratio=2)
    out = np.asarray(out)
    for r in range(3):
        want = np_roi_align(feat[views[r]], rois[r], 0.25)
        np.testing.assert_allclose(out[r], want, rtol=1e-4, atol=1e-4)


def test_roi_align_adaptive_matches_oracle(rng):
    """sampling_ratio=0 -> mmcv adaptive ceil(bin) per RoI per axis
    (ref exp config sampling_ratio=-1 at ..._ep24.py:51, detector
    extractor sampling_ratio=0 at maskrcnn_r50.py:40)."""
    feat = rng.normal(size=(2, 16, 24, 4)).astype(np.float32)
    # bins spanning <1, ~1.5, ~3.4 cells per axis (ceil = 1, 2, 4) plus a
    # strongly anisotropic roi (gy != gx)
    rois = np.asarray([[10., 5., 20., 12.], [0., 0., 44., 41.],
                       [2., 8., 94., 62.], [4., 4., 90., 18.]], np.float32)
    views = np.asarray([0, 1, 1, 0], np.int32)
    out = np.asarray(roi_align.roi_align(
        jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(views),
        spatial_scale=0.25, output_size=7, sampling_ratio=0))
    for r in range(len(rois)):
        want = np_roi_align(feat[views[r]], rois[r], 0.25, samp=0)
        np.testing.assert_allclose(out[r], want, rtol=1e-4, atol=1e-4)


def test_separable_roi_align_adaptive(rng):
    """The 3D-head align path (separable two-matmul) with adaptive
    sampling, incl. a full-map roi whose bins span many cells."""
    feat = rng.normal(size=(2, 32, 88, 4)).astype(np.float32)
    boxes = np.asarray([[[16., 16., 1400., 500.],      # bin ~12.4 x 4.3
                         [100., 40., 300., 200.]],
                        [[0., 0., 64., 48.],           # bin < 1
                         [640., 128., 1280., 480.]]], np.float32)
    out = np.asarray(roi_align.separable_roi_align_views(
        jnp.asarray(feat), jnp.asarray(boxes), 1.0 / 16, 7,
        sampling_ratio=-1))
    for v in range(2):
        for p in range(2):
            want = np_roi_align(feat[v], boxes[v, p], 1.0 / 16, samp=0)
            np.testing.assert_allclose(out[v, p], want, rtol=1e-4, atol=1e-4)


def test_roi_align_adaptive_degenerate_roi_is_zero():
    """mmcv: ceil(bin)=0 on an axis -> zero samples -> zero output."""
    feat = jnp.ones((1, 16, 16, 2))
    rois = jnp.asarray([[8.0, 8.0, 8.0, 24.0]])        # zero width
    out = roi_align.roi_align(feat, rois, jnp.zeros((1,), jnp.int32),
                              spatial_scale=1.0, output_size=7,
                              sampling_ratio=0)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    sep = roi_align.separable_roi_align_views(
        feat, rois[None], 1.0, 7, sampling_ratio=0)
    np.testing.assert_allclose(np.asarray(sep), 0.0)


def test_multilevel_roi_align_routing(rng):
    feats = [jnp.asarray(rng.normal(size=(1, 64 // s, 64 // s, 3)),
                         dtype=jnp.float32) for s in (1, 2, 4, 8)]
    strides = [4, 8, 16, 32]
    # mmdet routing: lvl = floor(log2(sqrt(area)/56)) clamped to [0, 3]
    # 40px -> lvl 0, 250px -> lvl 2, 460px -> lvl 3
    rois = jnp.asarray([[0., 0., 40., 40.], [0., 0., 250., 250.],
                        [0., 0., 460., 460.]])
    views = jnp.zeros((3,), dtype=jnp.int32)
    out = roi_align.multilevel_roi_align(feats, rois, views, strides)
    for r, lvl in [(0, 0), (1, 2), (2, 3)]:
        want = roi_align.roi_align(feats[lvl], rois[r:r + 1], views[:1],
                                   1.0 / strides[lvl])
        np.testing.assert_allclose(np.asarray(out[r]), np.asarray(want[0]),
                                   rtol=1e-4, atol=1e-5)


def test_masked_softmax_zero_rows():
    logits = jnp.asarray([[1.0, 2.0, 3.0], [5.0, 5.0, 5.0]])
    allowed = jnp.asarray([[True, False, True], [False, False, False]])
    p = np.asarray(attention.masked_softmax(logits, allowed))
    assert p[0, 1] == 0
    np.testing.assert_allclose(p[0].sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(p[1], 0.0)


def test_mha_mask_blocks_information(rng):
    B, Q, K, C = 1, 3, 5, 8
    q = jnp.asarray(rng.normal(size=(B, Q, C)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, K, C)), dtype=jnp.float32)
    allowed = np.ones((B, Q, K), bool)
    allowed[0, 1, 3] = False
    out1 = attention.multi_head_attention(q, k, k, 2, jnp.asarray(allowed))
    k2 = np.asarray(k).copy()
    k2[0, 3] += 100.0  # only key 3 changes
    out2 = attention.multi_head_attention(q, jnp.asarray(k2),
                                          jnp.asarray(k2), 2,
                                          jnp.asarray(allowed))
    # query 1 masked key 3 -> unchanged; query 0 sees it -> changed
    np.testing.assert_allclose(np.asarray(out1)[0, 1], np.asarray(out2)[0, 1],
                               atol=1e-5)
    assert np.abs(np.asarray(out1)[0, 0] - np.asarray(out2)[0, 0]).max() > 1e-3


def test_dcn_zero_offsets_is_half_conv(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 10, 4)), dtype=jnp.float32)
    mod = ModulatedDeformConv(features=6)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    w = params['params']['kernel']                        # [9, 4, 6]
    whwio = np.asarray(w).reshape(3, 3, 4, 6)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(whwio), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    # zero-init offsets, sigmoid(0)=0.5 modulation -> 0.5 * plain conv
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_dcn_stride2_shape(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 4)), dtype=jnp.float32)
    mod = ModulatedDeformConv(features=6, stride=2)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (2, 4, 6, 6)


def test_block_layout_align_matches_gather(rng):
    """Block-layout gather path must be numerically identical to 4-gather."""
    feats = [jnp.asarray(rng.normal(size=(2, 64 // s, 64 // s, 8)),
                         dtype=jnp.float32) for s in (1, 2, 4, 8)]
    strides = [4, 8, 16, 32]
    rois = jnp.asarray(rng.uniform(0, 120, (20, 2)))
    rois = jnp.concatenate([rois, rois + rng.uniform(10, 120, (20, 2))],
                           -1).astype(jnp.float32)
    views = jnp.asarray(rng.integers(0, 2, 20), jnp.int32)
    a = roi_align.multilevel_roi_align(feats, rois, views, strides,
                                       block_layout=False)
    b = roi_align.multilevel_roi_align(feats, rois, views, strides,
                                       block_layout=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_separable_roi_align_matches_gather(rng):
    """The two-matmul separable form == the gather roi_align, incl borders."""
    import jax.numpy as jnp
    from mv2d_tpu.ops.roi_align import roi_align, separable_roi_align_views
    V, H, W, C = 2, 16, 24, 8
    feat = jnp.asarray(rng.normal(size=(V, H, W, C)), jnp.float32)
    P = 9
    xy = rng.uniform(-30, 350, (V, P, 2))
    wh = rng.uniform(2, 300, (V, P, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    # a roi fully outside (zero), one spanning the border, one tiny
    boxes = boxes.at[0, 0].set(jnp.asarray([-200., -200., -40., -40.]))
    boxes = boxes.at[0, 1].set(jnp.asarray([-60., -60., 90., 90.]))
    boxes = boxes.at[1, 2].set(jnp.asarray([33., 17., 34.5, 18.2]))
    vi = jnp.repeat(jnp.arange(V), P)
    want = roi_align(feat, boxes.reshape(V * P, 4), vi, 1.0 / 16.0,
                     output_size=7, sampling_ratio=2)
    got = separable_roi_align_views(feat, boxes, 1.0 / 16.0,
                                    output_size=7, sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(got).reshape(V * P, 7, 7, C),
                               np.asarray(want), rtol=1e-4, atol=1e-4)
