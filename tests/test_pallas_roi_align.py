import jax.numpy as jnp
import numpy as np
import pytest

from mv2d_tpu.ops.pallas_roi_align import pallas_multilevel_roi_align
from mv2d_tpu.ops.roi_align import multilevel_roi_align


def test_pallas_align_matches_xla(rng):
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(2, 256 // s, 384 // s, 8)),
                         dtype=jnp.float32) for s in strides]
    n = 37
    xy = rng.uniform(0, 250, (n, 2))
    wh = rng.uniform(8, 300, (n, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], 1), jnp.float32)
    views = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    want = multilevel_roi_align(feats, rois, views, strides)
    got = pallas_multilevel_roi_align(feats, rois, views, strides,
                                      rois_per_step=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_pallas_align_edge_rois(rng):
    """RoIs hugging image borders and spanning the whole image."""
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(1, 128 // s, 352 // s, 8)),
                         dtype=jnp.float32) for s in strides]
    rois = jnp.asarray([
        [0., 0., 352., 128.],       # whole image -> coarsest level
        [-10., -10., 30., 30.],     # out-of-bounds corner
        [340., 120., 352., 128.],   # bottom-right sliver
    ], jnp.float32)
    views = jnp.zeros((3,), jnp.int32)
    want = multilevel_roi_align(feats, rois, views, strides)
    got = pallas_multilevel_roi_align(feats, rois, views, strides,
                                      rois_per_step=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_pallas_align_pass_routing_and_overflow(rng):
    """Each size class (3 patch passes + extreme-aspect overflow) is exact."""
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(2, 512 // s, 1408 // s, 8)),
                         dtype=jnp.float32) for s in strides]
    rois = jnp.asarray([
        [100., 100., 130., 124.],     # tiny -> 16-row pass
        [100., 100., 420., 300.],     # medium -> 32-row pass
        [10., 10., 1398., 500.],      # huge -> 64-row pass
        [0., 200., 1400., 240.],      # extreme aspect -> overflow fallback
        [600., 0., 640., 512.],       # tall sliver -> overflow fallback
    ], jnp.float32)
    views = jnp.asarray([0, 1, 0, 1, 0], jnp.int32)
    want = multilevel_roi_align(feats, rois, views, strides)
    got = pallas_multilevel_roi_align(feats, rois, views, strides,
                                      rois_per_step=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_pallas_align_views_matches_xla(rng):
    """Slab-resident per-view variant (the R-CNN stage shape)."""
    from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(3, 256 // s, 384 // s, 8)),
                         dtype=jnp.float32) for s in strides]
    V, P = 3, 24
    xy = rng.uniform(0, 250, (V, P, 2))
    wh = rng.uniform(4, 380, (V, P, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    # include extreme-aspect overflow rois
    rois = rois.at[0, 0].set(jnp.asarray([0., 100., 380., 112.]))
    rois = rois.at[2, 5].set(jnp.asarray([200., 0., 212., 250.]))
    vi = jnp.repeat(jnp.arange(V), P)
    want = multilevel_roi_align(feats, rois.reshape(V * P, 4), vi, strides)
    got = pallas_roi_align_views(feats, rois, strides, rois_per_step=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(V * P, 7, 7, 8),
                               np.asarray(want), rtol=2e-3, atol=2e-3)
    # compacted mode: out[v, pos[v, p]] == roi p of view v (incl. overflow)
    out_c, pos = pallas_roi_align_views(feats, rois, strides,
                                        rois_per_step=4, interpret=True,
                                        compacted=True)
    unperm = jnp.take_along_axis(out_c, pos[:, :, None, None, None], 1)
    np.testing.assert_allclose(np.asarray(unperm), np.asarray(got),
                               rtol=1e-6, atol=1e-6)


def test_pallas_align_views_single_short_level(rng):
    """Single p4-style level whose slab (32 rows) is shorter than the
    largest patch pass - exercises the zero-pad slab path used by the
    roi-head align (models/mv2d.py roi_head_forward)."""
    from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views
    feats = [jnp.asarray(rng.normal(size=(2, 32, 88, 16)), jnp.float32)]
    V, P = 2, 16
    xy = rng.uniform(0, 600, (V, P, 2)) * jnp.asarray([1.0, 0.5])
    wh = rng.uniform(8, 700, (V, P, 2)) * jnp.asarray([1.0, 0.6])
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    rois = rois.at[0, 0].set(jnp.asarray([0., 0., 1380., 500.]))  # huge
    vi = jnp.repeat(jnp.arange(V), P)
    want = multilevel_roi_align(feats, rois.reshape(V * P, 4), vi, [16])
    got = pallas_roi_align_views(feats, rois, [16], rois_per_step=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(V * P, 7, 7, 16),
                               np.asarray(want), rtol=2e-3, atol=2e-3)


def test_pallas_align_views_train_grad(rng):
    """Trainable slab align: forward parity AND feature-gradient parity
    against the XLA gather align (the backward is a separate slab-resident
    accumulation kernel - windows, masks and sample-mean folds must
    transpose the forward exactly)."""
    import jax
    from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views_train

    strides = (4, 8)
    dims = [(32, 80), (16, 40)]
    V, P, C = 2, 11, 8
    feats = [jnp.asarray(rng.normal(size=(V, h, w, C)), jnp.float32)
             for h, w in dims]
    rois = np.zeros((V, P, 4), np.float32)
    for v in range(V):
        for p in range(P):
            x1, y1 = rng.uniform(0, 200), rng.uniform(0, 80)
            w, h = rng.uniform(4, 120), rng.uniform(4, 120)
            rois[v, p] = [x1, y1, x1 + w, y1 + h]
    rois[0, 3] = [0, 0, 310, 9]      # extreme aspect -> overflow path
    rois[1, 7] = [2, 1, 8.5, 124]
    rois = jnp.asarray(rois)
    vi = jnp.repeat(jnp.arange(V), P)

    out_s, pos = pallas_roi_align_views_train(feats, rois, strides,
                                              interpret=True)
    out = jnp.take_along_axis(out_s, pos[:, :, None, None, None], 1)
    ref = multilevel_roi_align(feats, rois.reshape(-1, 4), vi,
                               strides).reshape(V, P, 7, 7, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    cot = jnp.asarray(rng.normal(size=out.shape), jnp.float32)

    def f_new(fs):
        o, p_ = pallas_roi_align_views_train(fs, rois, strides,
                                             interpret=True)
        o = jnp.take_along_axis(o, p_[:, :, None, None, None], 1)
        return (o * cot).sum()

    def f_ref(fs):
        o = multilevel_roi_align(fs, rois.reshape(-1, 4), vi,
                                 strides).reshape(V, P, 7, 7, C)
        return (o * cot).sum()

    g_new = jax.grad(f_new)(feats)
    g_ref = jax.grad(f_ref)(feats)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('nr', [8, 16])
def test_pallas_align_views_v2_fat_steps(rng, nr):
    """v2 batched-hat body with in-step chunking (big passes chunk to
    bound per-chunk registers) matches the XLA oracle at fat nr."""
    from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(2, 256 // s, 384 // s, 8)),
                         dtype=jnp.float32) for s in strides]
    V, P = 2, 40
    xy = rng.uniform(0, 250, (V, P, 2))
    wh = rng.uniform(4, 380, (V, P, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    vi = jnp.repeat(jnp.arange(V), P)
    want = multilevel_roi_align(feats, rois.reshape(V * P, 4), vi, strides)
    got = pallas_roi_align_views(feats, rois, strides, rois_per_step=nr,
                                 interpret=True, v2=True)
    np.testing.assert_allclose(np.asarray(got).reshape(V * P, 7, 7, 8),
                               np.asarray(want), rtol=2e-3, atol=2e-3)


def test_pallas_align_adaptive_matches_xla(rng):
    """sampling_ratio=0 (mmcv adaptive, the reference extractor setting)
    through the patch-DMA kernel matches the XLA adaptive lattice."""
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(2, 256 // s, 384 // s, 8)),
                         dtype=jnp.float32) for s in strides]
    n = 23
    xy = rng.uniform(0, 250, (n, 2))
    wh = rng.uniform(8, 300, (n, 2))
    # clip to the image like the model's proposals (RPN decode clips):
    # adaptive exactness is guaranteed for in-image rois (beyond-map rois
    # clamp their sample count at the map-derived cap)
    rois = np.concatenate([xy, np.minimum(xy + wh, [384.0, 256.0])], 1)
    rois = jnp.asarray(rois, jnp.float32)
    views = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    # adaptive_max=16 makes the XLA reference exact for every roi here
    # (max ceil(bin) ~ 13); the Pallas overflow path is exact-unclamped
    want = multilevel_roi_align(feats, rois, views, strides,
                                sampling_ratio=0, adaptive_max=16)
    got = pallas_multilevel_roi_align(feats, rois, views, strides,
                                      sampling_ratio=0,
                                      rois_per_step=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_pallas_align_views_adaptive(rng):
    """Slab kernel adaptive sampling (fwd, incl. v2 batched-hat body)."""
    from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(2, 256 // s, 384 // s, 8)),
                         dtype=jnp.float32) for s in strides]
    V, P = 2, 24
    xy = rng.uniform(0, 250, (V, P, 2))
    wh = rng.uniform(8, 320, (V, P, 2))
    rois = np.concatenate([xy, np.minimum(xy + wh, [384.0, 256.0])], -1)
    rois = jnp.asarray(rois, jnp.float32)
    vi = jnp.repeat(jnp.arange(V), P)
    want = multilevel_roi_align(feats, rois.reshape(V * P, 4), vi, strides,
                                sampling_ratio=0, adaptive_max=16)
    for v2 in (False, True):
        got = pallas_roi_align_views(feats, rois, strides, sampling_ratio=0,
                                     rois_per_step=4, interpret=True, v2=v2)
        np.testing.assert_allclose(np.asarray(got).reshape(V * P, 7, 7, 8),
                                   np.asarray(want), rtol=2e-3, atol=2e-3)


def test_pallas_align_views_adaptive_overflow(rng):
    """Extreme-aspect overflow rois under adaptive sampling: the Pallas
    overflow path is band-dense and EXACT (unclamped ceil(bin) hats);
    the XLA reference needs adaptive_max >= the true max ceil."""
    from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(1, 128 // s, 352 // s, 8)),
                         dtype=jnp.float32) for s in strides]
    rois = jnp.asarray([[[0., 100., 350., 112.],
                         [200., 0., 212., 122.],
                         [30., 40., 120., 100.]]], jnp.float32)
    vi = jnp.zeros((3,), jnp.int32)
    want = multilevel_roi_align(feats, rois.reshape(3, 4), vi, strides,
                                sampling_ratio=0, adaptive_max=16)
    got = pallas_roi_align_views(feats, rois, strides, sampling_ratio=0,
                                 rois_per_step=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(3, 7, 7, 8),
                               np.asarray(want), rtol=2e-3, atol=2e-3)


def test_pallas_align_views_train_adaptive_grad(rng):
    """Trainable slab align with adaptive sampling: forward + feature
    gradients match the XLA adaptive align (the backward mirrors the
    forward's per-RoI sample counts)."""
    import jax
    from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views_train

    strides = (4, 8)
    dims = [(32, 80), (16, 40)]
    V, P, C = 2, 9, 8
    feats = [jnp.asarray(rng.normal(size=(V, h, w, C)), jnp.float32)
             for h, w in dims]
    rois = np.zeros((V, P, 4), np.float32)
    for v in range(V):
        for p in range(P):
            x1, y1 = rng.uniform(0, 200), rng.uniform(0, 80)
            w, h = rng.uniform(4, 120), rng.uniform(4, 120)
            rois[v, p] = [x1, y1, x1 + w, y1 + h]
    rois = jnp.asarray(rois)
    vi = jnp.repeat(jnp.arange(V), P)

    out_s, pos = pallas_roi_align_views_train(feats, rois, strides,
                                              sampling_ratio=0,
                                              interpret=True)
    out = jnp.take_along_axis(out_s, pos[:, :, None, None, None], 1)
    ref = multilevel_roi_align(feats, rois.reshape(-1, 4), vi, strides,
                               sampling_ratio=0).reshape(V, P, 7, 7, C)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    import jax as _jax
    cot = jnp.asarray(rng.normal(size=out.shape), jnp.float32)

    def f_new(fs):
        o, p_ = pallas_roi_align_views_train(fs, rois, strides,
                                             sampling_ratio=0,
                                             interpret=True)
        o = jnp.take_along_axis(o, p_[:, :, None, None, None], 1)
        return (o * cot).sum()

    def f_ref(fs):
        o = multilevel_roi_align(fs, rois.reshape(-1, 4), vi, strides,
                                 sampling_ratio=0).reshape(V, P, 7, 7, C)
        return (o * cot).sum()

    g_new = _jax.grad(f_new)(feats)
    g_ref = _jax.grad(f_ref)(feats)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_pallas_align_views_overflow_full_bucket(rng):
    """More than 32 overflow rois forces the FULL-bucket switch branch
    (the tiered overflow path: no-op / K=32 / K=overflow_bucket)."""
    from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.normal(size=(2, 256 // s, 384 // s, 8)),
                         dtype=jnp.float32) for s in strides]
    V, P = 2, 48
    xy = rng.uniform(0, 250, (V, P, 2))
    wh = rng.uniform(4, 100, (V, P, 2))
    rois = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    # 40 extreme-aspect rois (> 61 cells at the routed level) - more than
    # the 32-slot small tier
    for i in range(20):
        y = 5 * i
        rois[0, i] = [0., y, 380., y + 10.]
        rois[1, i] = [5 * i, 0., 5 * i + 10., 250.]
    rois = jnp.asarray(rois)
    vi = jnp.repeat(jnp.arange(V), P)
    want = multilevel_roi_align(feats, rois.reshape(V * P, 4), vi, strides)
    got = pallas_roi_align_views(feats, rois, strides, rois_per_step=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(V * P, 7, 7, 8),
                               np.asarray(want), rtol=2e-3, atol=2e-3)


def test_band_pass_routing(rng, monkeypatch):
    """With MV2D_ALIGN_BANDS=1 (opt-in; the in-kernel band dots measured
    slower than the XLA overflow branches they replace - PERF.md round 5),
    extreme-aspect rois route to the kernel band passes."""
    monkeypatch.setenv('MV2D_ALIGN_BANDS', '1')
    from mv2d_tpu.ops.pallas_roi_align import PASS_SIZES, _prv_geom
    strides = (4, 8, 16, 32)
    dims = ((128, 352), (64, 176), (32, 88), (16, 44))
    rois = np.asarray([[
        [100., 100., 200., 180.],     # ordinary -> square pass
        [0., 200., 1400., 240.],      # barrier-like -> WIDE band pass
        [600., 0., 640., 500.],       # close pedestrian -> TALL band pass
        [0., 0., 1400., 500.],        # huge -> coarse level, square pass
    ]], np.float32)
    g = _prv_geom(dims, jnp.asarray(rois), strides, 7, 56.0, 8)
    pid = np.asarray(g['pass_id'])
    npass = len(PASS_SIZES)
    assert pid[0] < npass
    assert pid[1] == npass          # wide band
    assert pid[2] == npass + 1      # tall band
    assert pid[3] < npass           # sqrt(area) routes it coarse; fits
    assert g['nkp'] == npass + 2
