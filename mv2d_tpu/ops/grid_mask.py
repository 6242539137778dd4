"""GridMask image augmentation (training only).

Re-implements CustomGridMask (ref: models/utils/grid_mask.py:128-196) with
jax PRNG: per-view random grid interval/offsets/rotation dropout applied to
the input images.  Shipped MV2D-T config: use_h/use_w, rotate=1 (no rotation
range beyond 1 => rotation disabled is k=0..0), ratio 0.4-0.6, mode=1 (keep
grid cells, zero the bands), prob 0.7, interv_ratio 0.8 (..._ep24.py:12-21).

The reference samples a random integer grid spacing d in
[interv_ratio * base, base] with base = 2..min(h,w), builds 1D on/off band
patterns for rows and columns, and (mode=1) keeps pixels where both bands are
on.  We reproduce that with static shapes; rotation of the mask grid is
approximated by a random phase offset per axis (the config uses rotate=1,
i.e. rotation k in {0}, so this matches the shipped recipe exactly).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(rng: jax.Array, imgs: jnp.ndarray, prob: float = 0.7,
              ratio_range=(0.4, 0.6), interv_ratio: float = 0.8,
              mode: int = 1) -> jnp.ndarray:
    """imgs: [V, H, W, 3] (or pre-folded s2d [V, H/2, W/2, 12] with
    (dy, dx, c) channel order) -> masked images (training augmentation).

    The s2d path draws the SAME band patterns at full resolution and
    applies them through broadcast factors, so fold(grid_mask(x)) ==
    grid_mask(fold(x)) exactly."""
    V, Hi, Wi, C = imgs.shape
    s2d = C == 12
    H, W = (Hi * 2, Wi * 2) if s2d else (Hi, Wi)
    keys = jax.random.split(rng, 6)
    apply = jax.random.uniform(keys[0], (V,)) < prob
    # grid spacing d per view: uniform in [2, min(H, W)] scaled by interv_ratio
    dmax = min(H, W)
    d_hi = jax.random.uniform(keys[1], (V,), minval=2.0, maxval=float(dmax))
    d = jax.random.uniform(keys[2], (V,), minval=interv_ratio, maxval=1.0) * d_hi
    d = jnp.maximum(d, 2.0)
    ratio = jax.random.uniform(keys[3], (V,), minval=ratio_range[0],
                               maxval=ratio_range[1])
    keep_len = d * ratio          # length of the kept band within each period
    off_y = jax.random.uniform(keys[4], (V,)) * d
    off_x = jax.random.uniform(keys[5], (V,)) * d

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    # band on = within first keep_len of each period
    on_y = jnp.mod(ys[None, :] + off_y[:, None], d[:, None]) < keep_len[:, None]
    on_x = jnp.mod(xs[None, :] + off_x[:, None], d[:, None]) < keep_len[:, None]
    if s2d:
        ky = on_y.reshape(V, Hi, 2)
        kx = on_x.reshape(V, Wi, 2)
        cell = ky[:, :, None, :, None] & kx[:, None, :, None, :]
        if mode != 1:
            cell = ~cell
        cell = cell | ~apply[:, None, None, None, None]
        keep = jnp.broadcast_to(cell[..., None],
                                (V, Hi, Wi, 2, 2, 3)).reshape(V, Hi, Wi, 12)
        return imgs * keep.astype(imgs.dtype)
    if mode == 1:
        keep = on_y[:, :, None] & on_x[:, None, :]      # keep grid cells
    else:
        keep = ~(on_y[:, :, None] & on_x[:, None, :])
    keep = keep | ~apply[:, None, None]
    return imgs * keep[..., None].astype(imgs.dtype)
