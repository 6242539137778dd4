"""GridMask image augmentation (training only).

Re-implements CustomGridMask (ref: models/utils/grid_mask.py:128-196) with
jax PRNG, matching the reference's sampling and mask algebra exactly:

  * one Bernoulli(prob) gate for the WHOLE multi-view batch (ref :146),
  * per view: integer grid period d ~ randint(2, max(int(H*interv_ratio),
    3)), ratio ~ U(ratio_range), band length l = clip(int(d*ratio + 0.5),
    1, d-1), integer band offsets st_h/st_w ~ randint(d) on a 1.5x canvas,
  * the base mask zeroes the UNION of row bands (use_h) and column bands
    (use_w) on the canvas; bands are only drawn for period indices
    i < canvas_extent // d (ref loop bound :161-166),
  * rotation: r ~ randint(rotate) DEGREES of the canvas mask about its
    center (nearest sampling, out-of-canvas = masked, like PIL
    Image.rotate's fill=0), then center crop to (H, W).  The shipped
    recipes use rotate=1 => r = 0, where this path is skipped entirely,
  * mode=0 keeps the cells (x * mask), mode=1 keeps the band union
    (x * (1 - mask)) (ref :180-183).  Shipped MV2D-T config: use_h/use_w,
    rotate=1, ratio 0.4-0.6, mode=1, prob 0.7, interv_ratio 0.8
    (..._ep24.py:12-21).

The s2d path ([V, H/2, W/2, 12] pre-folded input, (dy, dx, c) channel
order) evaluates the SAME full-resolution keep grid and folds it, so
fold(grid_mask(x)) == grid_mask(fold(x)) exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bands(coord, st, d, length, n_periods):
    """True where `coord` (canvas axis position) falls inside a drawn band:
    band i covers [d*i + st, d*i + st + length) for i in [0, n_periods)."""
    rel = coord - st
    return (rel >= 0) & (rel % d < length) & (rel // d < n_periods)


def grid_keep_mask(d: jnp.ndarray, length: jnp.ndarray, st_h: jnp.ndarray,
                   st_w: jnp.ndarray, r, hw, mode: int = 1,
                   rotate: int = 1, use_h: bool = True,
                   use_w: bool = True) -> jnp.ndarray:
    """Deterministic mask construction given the per-view integer draws.

    d/length/st_h/st_w: [V] int32; r: [V] int32 rotation degrees (ignored
    when rotate <= 1); hw: full-res (H, W).  Returns keep [V, H, W] bool."""
    V = d.shape[0]
    H, W = hw
    hh, ww = int(1.5 * H), int(1.5 * W)
    oy, ox = (hh - H) // 2, (ww - W) // 2
    dv = d[:, None]
    lv = length[:, None]
    if rotate <= 1:      # r = randint(1) = 0: no rotation (shipped recipes)
        ys = (jnp.arange(H, dtype=jnp.int32) + oy)[None]          # canvas y
        xs = (jnp.arange(W, dtype=jnp.int32) + ox)[None]
        on_y = _bands(ys, st_h[:, None], dv, lv, (hh // d)[:, None]) \
            if use_h else jnp.zeros((V, H), bool)
        on_x = _bands(xs, st_w[:, None], dv, lv, (ww // d)[:, None]) \
            if use_w else jnp.zeros((V, W), bool)
        banded = on_y[:, :, None] | on_x[:, None, :]              # [V, H, W]
        inside = jnp.ones((), bool)
    else:
        ang = jnp.deg2rad(r.astype(jnp.float32))
        cy, cx = hh / 2.0, ww / 2.0
        yo = (jnp.arange(H, dtype=jnp.float32) + oy + 0.5 - cy)[None, :, None]
        xo = (jnp.arange(W, dtype=jnp.float32) + ox + 0.5 - cx)[None, None, :]
        ca = jnp.cos(ang)[:, None, None]
        sa = jnp.sin(ang)[:, None, None]
        # inverse rotation (output -> input canvas coords), nearest; the
        # sign convention matches PIL Image.rotate (counterclockwise in
        # y-down image coords) bit-exactly on the tested angles
        xin = jnp.floor(ca * xo - sa * yo + cx).astype(jnp.int32)
        yin = jnp.floor(sa * xo + ca * yo + cy).astype(jnp.int32)
        inside = (xin >= 0) & (xin < ww) & (yin >= 0) & (yin < hh)
        dv3, lv3 = d[:, None, None], length[:, None, None]
        on_y = _bands(yin, st_h[:, None, None], dv3, lv3,
                      (hh // d)[:, None, None]) if use_h else False
        on_x = _bands(xin, st_w[:, None, None], dv3, lv3,
                      (ww // d)[:, None, None]) if use_w else False
        banded = on_y | on_x

    if mode == 1:
        # keep the band union; rotated-out-of-canvas pixels (mask0 fill=0)
        # flip to kept under the inversion (1 - 0 = 1), like the reference
        return banded | ~inside
    return ~banded & inside


def grid_mask(rng: jax.Array, imgs: jnp.ndarray, prob: float = 0.7,
              ratio_range=(0.4, 0.6), interv_ratio: float = 0.8,
              mode: int = 1, rotate: int = 1, use_h: bool = True,
              use_w: bool = True) -> jnp.ndarray:
    """imgs: [V, H, W, 3] (or pre-folded s2d [V, H/2, W/2, 12]) -> masked
    images (training augmentation)."""
    V, Hi, Wi, C = imgs.shape
    s2d = C == 12
    H, W = (Hi * 2, Wi * 2) if s2d else (Hi, Wi)
    keys = jax.random.split(rng, 6)
    apply = jax.random.uniform(keys[0], ()) < prob      # batch-level gate
    dmax = max(int(H * interv_ratio), 3)
    d = jax.random.randint(keys[1], (V,), 2, dmax)
    ratio = jax.random.uniform(keys[2], (V,), minval=ratio_range[0],
                               maxval=ratio_range[1])
    length = jnp.clip((d * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jnp.floor(jax.random.uniform(keys[3], (V,)) * d).astype(jnp.int32)
    st_w = jnp.floor(jax.random.uniform(keys[4], (V,)) * d).astype(jnp.int32)
    r = jax.random.randint(keys[5], (V,), 0, max(rotate, 1))

    keep = grid_keep_mask(d, length, st_h, st_w, r, (H, W), mode=mode,
                          rotate=rotate, use_h=use_h, use_w=use_w)
    keep = keep | ~apply
    if s2d:
        k = keep.reshape(V, Hi, 2, Wi, 2).transpose(0, 1, 3, 2, 4)
        k = jnp.broadcast_to(k[..., None], (V, Hi, Wi, 2, 2, 3))
        return imgs * k.reshape(V, Hi, Wi, 12).astype(imgs.dtype)
    return imgs * keep[..., None].astype(imgs.dtype)
