import jax.numpy as jnp
import numpy as np

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
