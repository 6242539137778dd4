"""GridMask oracle tests: literal numpy transcription of the reference's
CustomGridMask.forward (ref models/utils/grid_mask.py:146-196) driven with
the same integer draws as the jax implementation."""
import jax.numpy as jnp
import numpy as np
import pytest

from mv2d_tpu.ops.grid_mask import grid_keep_mask, grid_mask


def oracle_keep(d, length, st_h, st_w, r, hw, mode=1, use_h=True,
                use_w=True):
    """Reference mask loop, one view.  Rotation via PIL like the
    reference."""
    H, W = hw
    hh, ww = int(1.5 * H), int(1.5 * W)
    mask = np.ones((hh, ww), np.float32)
    if use_h:
        for i in range(hh // d):
            s = d * i + st_h
            t = min(s + length, hh)
            mask[s:t, :] *= 0
    if use_w:
        for i in range(ww // d):
            s = d * i + st_w
            t = min(s + length, ww)
            mask[:, s:t] *= 0
    if r:
        from PIL import Image
        mask = np.asarray(Image.fromarray(np.uint8(mask)).rotate(r),
                          dtype=np.float32)
    mask = mask[(hh - H) // 2:(hh - H) // 2 + H,
                (ww - W) // 2:(ww - W) // 2 + W]
    if mode == 1:
        mask = 1 - mask
    return mask > 0.5   # keep = multiply by mask


@pytest.mark.parametrize('mode', [0, 1])
@pytest.mark.parametrize('use_h,use_w', [(True, True), (True, False),
                                         (False, True)])
def test_grid_keep_matches_reference_loop(rng, mode, use_h, use_w):
    H, W = 48, 64
    V = 5
    d = rng.integers(2, max(int(H * 0.8), 3), V)
    ratio = rng.uniform(0.4, 0.6, V)
    length = np.clip((d * ratio + 0.5).astype(int), 1, d - 1)
    st_h = np.asarray([rng.integers(dd) for dd in d])
    st_w = np.asarray([rng.integers(dd) for dd in d])
    got = np.asarray(grid_keep_mask(
        jnp.asarray(d, jnp.int32), jnp.asarray(length, jnp.int32),
        jnp.asarray(st_h, jnp.int32), jnp.asarray(st_w, jnp.int32),
        jnp.zeros(V, jnp.int32), (H, W), mode=mode, rotate=1,
        use_h=use_h, use_w=use_w))
    for v in range(V):
        want = oracle_keep(int(d[v]), int(length[v]), int(st_h[v]),
                           int(st_w[v]), 0, (H, W), mode=mode,
                           use_h=use_h, use_w=use_w)
        np.testing.assert_array_equal(got[v], want, err_msg=f'view {v}')


@pytest.mark.parametrize('r', [3, 17, 45])
def test_grid_keep_rotation_close_to_pil(rng, r):
    """r > 0 degrees: nearest-sampled rotation vs PIL Image.rotate.
    Band-edge pixels may round differently (PIL's fixed-point affine);
    require < 2% disagreement and identical keep on the interior."""
    pytest.importorskip('PIL')
    H, W = 48, 64
    d, ratio = 11, 0.5
    length = int(np.clip(int(d * ratio + 0.5), 1, d - 1))
    st_h, st_w = 4, 7
    got = np.asarray(grid_keep_mask(
        jnp.asarray([d], jnp.int32), jnp.asarray([length], jnp.int32),
        jnp.asarray([st_h], jnp.int32), jnp.asarray([st_w], jnp.int32),
        jnp.asarray([r], jnp.int32), (H, W), mode=1, rotate=360))[0]
    want = oracle_keep(d, length, st_h, st_w, r, (H, W), mode=1)
    mismatch = (got != want).mean()
    assert mismatch < 0.02, mismatch
    # rotation must actually change the mask vs the r=0 pattern
    want0 = oracle_keep(d, length, st_h, st_w, 0, (H, W), mode=1)
    assert (want0 != got).mean() > 0.01


def test_grid_mask_batch_gate_and_mode1_keeps_band_union(rng):
    """Shipped recipe semantics: mode=1 keeps the UNION of row/col bands
    (ref :161-183 - mask zeroes bands, mode 1 inverts), so kept fraction
    ~ 2*ratio - ratio^2, NOT ratio^2."""
    import jax
    imgs = jnp.ones((4, 64, 96, 3), jnp.float32)
    kept = []
    for s in range(30):
        out = np.asarray(grid_mask(jax.random.PRNGKey(s), imgs, prob=1.0))
        kept.append((out > 0).mean())
    m = float(np.mean(kept))
    # ratio in (0.4, 0.6): union keep fraction in ~(0.64, 0.84); the
    # intersection bug this guards against gives (0.16, 0.36)
    assert 0.55 < m < 0.92, m
    # prob gate: prob=0 never masks
    out = np.asarray(grid_mask(jax.random.PRNGKey(0), imgs, prob=0.0))
    np.testing.assert_array_equal(out, np.asarray(imgs))
