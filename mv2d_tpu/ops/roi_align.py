"""RoIAlign for TPU (XLA gather formulation).

Replaces the mmcv CUDA RoIAlign op (ref call sites: exp config
`bbox_roi_extractor` at configs/mv2d/exp/..._ep24.py:49-53 and
models/roi_heads/mv2d_head.py:114-115; plus the mmdet SingleRoIExtractor
multi-level routing used inside StandardRoIHead).

Semantics follow mmcv RoIAlign(aligned=True): the continuous coordinate of
output bin (i, j) sample (si, sj) is
    x = x1 + (j + (sj + 0.5) / S) * bin_w - 0.5 * aligned
with bilinear interpolation and zero padding outside the map, averaged over
S*S samples per bin.  The reference configures sampling_ratio in {-1, 0},
i.e. mmcv's ADAPTIVE rule: per-RoI, per-axis S = ceil(bin size) (zero
samples -> zero output).  sampling_ratio <= 0 here reproduces that exactly
via a masked static sample lattice of `adaptive_max` slots per axis: sample
positions use the true per-RoI S (traced), slots s >= S carry zero weight,
and the divisor is the true S - bit-equal to the dynamic loop whenever
ceil(bin) <= adaptive_max (callers size adaptive_max so the clamp never
binds on in-image RoIs; see each call site).

Formulated as one batched gather + weighted sum -> XLA lowers it to efficient
dynamic-gathers; channels stay in the last (lane) dimension.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def make_block_layout(feat: jnp.ndarray) -> jnp.ndarray:
    """[V, H, W, C] -> [4, V, Hb, Wb, 4C] parity block layout.

    Buffer (p, q) at (i, j) stacks the 2x2 cell neighbourhood starting at
    (2i + p, 2j + q), so the four corners of any bilinear sample live in ONE
    row: buffer = (y0 % 2)*2 + (x0 % 2), cell = (y0 // 2, x0 // 2).  Trades
    4x feature memory for 1 wide gather per sample instead of 4 narrow ones
    (TPU gathers are DMA-efficiency bound: ~4x fewer, 4x wider descriptors).

    Out-of-range neighbours read zero-padding; bilinear weights for clamped
    coordinates are zero, so results are bit-identical to the 4-gather form.
    """
    V, H, W, C = feat.shape
    Hb = H // 2 + 1
    Wb = W // 2 + 1
    fp = jnp.pad(feat, ((0, 0), (0, 4), (0, 4), (0, 0)))
    bufs = []
    for p in (0, 1):
        for q in (0, 1):
            cells = [fp[:, p + dy:p + dy + 2 * Hb:2,
                        q + dx:q + dx + 2 * Wb:2, :]
                     for dy in (0, 1) for dx in (0, 1)]
            bufs.append(jnp.concatenate(cells, axis=-1))
    return jnp.stack(bufs)                                   # [4, V, Hb, Wb, 4C]


def _bilinear_gather(feat: jnp.ndarray, view_idx: jnp.ndarray,
                     x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """feat: [V, H, W, C]; view_idx: [R]; x, y: [R, P] continuous coords.
    Returns [R, P, C] with zeros outside the feature map (mmcv border rule:
    points with x < -1 or x > W are zero, border-clamped inside)."""
    V, H, W, C = feat.shape
    inside = (x > -1.0) & (x < W) & (y > -1.0) & (y < H)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    lx = x - x0
    ly = y - y0
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    flat = feat.reshape(V * H * W, C)
    base = view_idx[:, None] * (H * W)

    def g(yi, xi):
        return flat[base + yi * W + xi]                     # [R, P, C]

    w00 = ((1 - ly) * (1 - lx))[..., None]
    w01 = ((1 - ly) * lx)[..., None]
    w10 = (ly * (1 - lx))[..., None]
    w11 = (ly * lx)[..., None]
    out = w00 * g(y0i, x0i) + w01 * g(y0i, x1i) + \
        w10 * g(y1i, x0i) + w11 * g(y1i, x1i)
    return jnp.where(inside[..., None], out, 0.0)


def _bilinear_gather_blocks(feat: jnp.ndarray, view_idx: jnp.ndarray,
                            x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Block-layout variant of _bilinear_gather: ONE 4C gather per sample.
    Numerically identical (see make_block_layout)."""
    V, H, W, C = feat.shape
    blocks = make_block_layout(feat)
    Hb, Wb = blocks.shape[2], blocks.shape[3]
    flat = blocks.reshape(-1, 4 * C)
    inside = (x > -1.0) & (x < W) & (y > -1.0) & (y < H)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0)[..., None]
    ly = (y - y0)[..., None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    buf = (y0i % 2) * 2 + (x0i % 2)
    rows = ((buf * V + view_idx[:, None]) * Hb + y0i // 2) * Wb + x0i // 2
    cells = flat[rows]                                      # [R, P, 4C]
    c00, c01, c10, c11 = jnp.split(cells, 4, axis=-1)
    out = (1 - ly) * (1 - lx) * c00 + (1 - ly) * lx * c01 + \
        ly * (1 - lx) * c10 + ly * lx * c11
    return jnp.where(inside[..., None], out, 0.0)


def _axis_grid(lo: jnp.ndarray, extent: jnp.ndarray, output_size: int,
               sampling_ratio: int, adaptive_max: int):
    """Per-axis RoIAlign sample coordinates and weights.

    lo/extent: [...] roi origin / extent in cells.  Returns
    (coords [..., O*S], weight [..., O*S], div [...]) where S is
    `sampling_ratio` if > 0 else `adaptive_max` masked slots realizing
    mmcv's adaptive per-RoI S = ceil(extent / O) (weight 0 for s >= S,
    div = max(S, 1); S = 0 zeroes the whole axis like mmcv's empty loop).
    """
    O = output_size
    dt = extent.dtype
    bin_ = extent / O
    oi = jnp.arange(O, dtype=dt)
    if sampling_ratio > 0:
        S = sampling_ratio
        frac = (jnp.arange(S, dtype=dt) + 0.5) / S
        xs = lo[..., None, None] + (oi[:, None] + frac) * bin_[..., None, None]
        wt = jnp.ones(xs.shape, dt)
        div = jnp.full(extent.shape, float(S), dt)
    else:
        S = adaptive_max
        sf = jnp.clip(jnp.ceil(bin_), 0.0, float(S))          # true ceil
        div = jnp.maximum(sf, 1.0)
        s = jnp.arange(S, dtype=dt)
        frac = (s + 0.5) / div[..., None]                     # [..., S]
        xs = lo[..., None, None] + \
            (oi[:, None] + frac[..., None, :]) * bin_[..., None, None]
        wt = jnp.broadcast_to((s < sf[..., None])[..., None, :].astype(dt),
                              xs.shape)
    return (xs.reshape(*extent.shape, O * S),
            wt.reshape(*extent.shape, O * S), div)


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, view_idx: jnp.ndarray,
              spatial_scale: float, output_size: int = 7,
              sampling_ratio: int = 2, aligned: bool = True,
              block_layout: bool = True,
              chunk: int | None = None,
              adaptive_max: int = 9) -> jnp.ndarray:
    """RoIAlign.

    feat: [V, H, W, C] (channels-last); rois: [R, 4] (x1,y1,x2,y2) in IMAGE
    pixels; view_idx: [R] which view each roi lives in.
    Returns [R, output_size, output_size, C].

    `chunk` bounds the [R, samples, C] gather transient (lax.map over RoI
    chunks) - needed when R*C is large in training (AD keeps the temp live).
    """
    R = rois.shape[0]
    if chunk is not None and R > chunk:
        nb = -(-R // chunk)
        pad = nb * chunk - R
        rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
        view_p = jnp.pad(view_idx, (0, pad))
        out = jax.lax.map(
            lambda args: roi_align(feat, args[0], args[1], spatial_scale,
                                   output_size, sampling_ratio, aligned,
                                   block_layout, adaptive_max=adaptive_max),
            (rois_p.reshape(nb, chunk, 4), view_p.reshape(nb, chunk)))
        O = output_size
        return out.reshape(nb * chunk, O, O, feat.shape[-1])[:R]
    S = sampling_ratio if sampling_ratio > 0 else adaptive_max
    O = output_size
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    xs, wx, divx = _axis_grid(x1, roi_w, O, sampling_ratio, adaptive_max)
    ys, wy, divy = _axis_grid(y1, roi_h, O, sampling_ratio, adaptive_max)
    # full sample lattice [R, O*S, O*S]
    X = jnp.broadcast_to(xs[:, None, :], (R, O * S, O * S)).reshape(R, -1)
    Y = jnp.broadcast_to(ys[:, :, None], (R, O * S, O * S)).reshape(R, -1)
    W_s = (wy[:, :, None] * wx[:, None, :]).reshape(R, -1)
    gather = _bilinear_gather_blocks if block_layout else _bilinear_gather
    vals = gather(feat, view_idx.astype(jnp.int32), X, Y)
    C = feat.shape[-1]
    vals = (vals * W_s[..., None]).reshape(R, O, S, O, S, C)
    return vals.sum(axis=(2, 4)) / (divy * divx)[:, None, None, None]


def _separable_weights(lo: jnp.ndarray, width: jnp.ndarray, n_cells: int,
                       output_size: int, sampling_ratio: int,
                       adaptive_max: int = 16) -> jnp.ndarray:
    """Per-RoI row/col RoIAlign weights [..., O, n_cells].

    Row oi of the result holds the bin's averaged bilinear hat profile over
    the feature grid: W[oi, c] = (1/S) sum_s hat(clip(x_s) - c) * 1[-1<x_s<n]
    with x_s = lo + (oi + (s+.5)/S) * width / O.  Contracting feature rows
    and columns with these matrices reproduces roi_align EXACTLY (the
    bilinear weights, border clamping, outside-zero rule and the SxS sample
    average all factor per axis).  sampling_ratio <= 0 = mmcv adaptive
    S = ceil(width / O) per RoI (exact while ceil <= adaptive_max; the
    weight-matrix shape is S-independent, so adaptivity is free downstream).
    """
    O = output_size
    xs, wt, div = _axis_grid(lo, width, O, sampling_ratio, adaptive_max)
    xs = xs.reshape(*lo.shape, O, -1)                      # [..., O, S]
    wt = wt.reshape(*lo.shape, O, -1)
    inside = (xs > -1.0) & (xs < n_cells)                  # [..., O, S]
    xc = jnp.clip(xs, 0.0, n_cells - 1)
    cells = jnp.arange(n_cells, dtype=xc.dtype)
    hat = jnp.maximum(1.0 - jnp.abs(xc[..., None] - cells), 0.0)
    hat = hat * (inside * wt)[..., None]
    return hat.sum(-2) / div[..., None, None]              # [..., O, cells]


def separable_roi_align_views(feat: jnp.ndarray, boxes: jnp.ndarray,
                              spatial_scale: float, output_size: int = 7,
                              sampling_ratio: int = 2,
                              aligned: bool = True,
                              adaptive_max: int | tuple = 16) -> jnp.ndarray:
    """RoIAlign as two dense batched matmuls over the shared per-view tile.

    feat: [V, H, W, C]; boxes: [V, P, 4] image-pixel rois.  Returns
    [V, P, O, O, C].  Exact roi_align semantics (see _separable_weights);
    instead of gathering 4 neighbours per sample (descriptor-rate bound,
    4x data amplification in the parity layout) every RoI row/col becomes a
    weight vector and the whole view tile is contracted on the MXU:
    out[p,i,j,c] = sum_y Wy[p,i,y] sum_x Wx[p,j,x] F[y,x,c].
    X is contracted first (the kept spatial axis is the short one).
    Differentiable (pure einsums).
    """
    import os as _os
    s_env = _os.environ.get('MV2D_ALIGN_FIXED_S')
    if s_env:
        # A/B knob (see pallas_roi_align): price of exact adaptive
        # ceil(bin) sampling vs a fixed count; measurement use only
        sampling_ratio = int(s_env)
    V, H, W, C = feat.shape
    offset = 0.5 if aligned else 0.0
    x1 = boxes[..., 0] * spatial_scale - offset
    y1 = boxes[..., 1] * spatial_scale - offset
    bw = (boxes[..., 2] - boxes[..., 0]) * spatial_scale
    bh = (boxes[..., 3] - boxes[..., 1]) * spatial_scale
    if not aligned:
        bw = jnp.maximum(bw, 1.0)
        bh = jnp.maximum(bh, 1.0)
    # adaptive_max may be (max_y, max_x): callers with a known map extent
    # cap each axis at its true worst case (e.g. ceil(H / stride / O)),
    # shrinking the weight-build lattice without losing exactness
    amax_y, amax_x = adaptive_max if isinstance(adaptive_max, tuple) \
        else (adaptive_max, adaptive_max)
    Wx = _separable_weights(x1, bw, W, output_size, sampling_ratio,
                            amax_x)
    Wy = _separable_weights(y1, bh, H, output_size, sampling_ratio,
                            amax_y)
    Wx = Wx.astype(feat.dtype)
    Wy = Wy.astype(feat.dtype)
    t = jnp.einsum('vpjx,vyxc->vpjyc', Wx, feat,
                   preferred_element_type=jnp.float32).astype(feat.dtype)
    out = jnp.einsum('vpiy,vpjyc->vpijc', Wy, t,
                     preferred_element_type=jnp.float32)
    return out.astype(feat.dtype)


def multilevel_roi_align(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                         view_idx: jnp.ndarray,
                         strides: Sequence[int], output_size: int = 7,
                         sampling_ratio: int = 2,
                         finest_scale: float = 56.0,
                         chunk: int = 2048,
                         block_layout: bool = True,
                         adaptive_max: int = 9) -> jnp.ndarray:
    """mmdet SingleRoIExtractor level routing: level = clamp(floor(log2(
    sqrt(area) / finest_scale + 1e-6)), 0, L-1), then RoIAlign on that level.

    TPU-native fused formulation: all levels are flattened into ONE buffer
    and each RoI gathers directly at its routed level's offset.  With
    `block_layout` the buffer is the 2x2 parity layout (make_block_layout):
    one 4C-wide gather per bilinear sample instead of four C-wide gathers -
    gathers are DMA-descriptor bound on TPU, so this is ~3-4x faster at the
    R-CNN stage's 12k RoIs.  `chunk`-sized lax.map bounds transient memory.
    """
    L = len(feats)
    V, _, _, C = feats[0].shape
    area = jnp.clip((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]),
                    0.0, None)
    scale = jnp.sqrt(area)
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, L - 1).astype(jnp.int32)

    lvl_off, off = [], 0
    Hs, Ws, Ss, Hbs, Wbs = [], [], [], [], []
    bufs = []
    for f, s in zip(feats, strides):
        lvl_off.append(off)
        Hs.append(f.shape[1])
        Ws.append(f.shape[2])
        Ss.append(1.0 / s)
        if block_layout:
            b = make_block_layout(f)                 # [4, V, Hb, Wb, 4C]
            Hbs.append(b.shape[2])
            Wbs.append(b.shape[3])
            bufs.append(b.reshape(-1, 4 * C))
            off += b.shape[0] * b.shape[1] * b.shape[2] * b.shape[3]
        else:
            bufs.append(f.reshape(-1, C))
            off += f.shape[0] * f.shape[1] * f.shape[2]
    flat = jnp.concatenate(bufs, axis=0)
    lvl_off = jnp.asarray(lvl_off)
    Hs = jnp.asarray(Hs)
    Ws = jnp.asarray(Ws)
    Ss = jnp.asarray(Ss, dtype=rois.dtype)
    if block_layout:
        Hbs = jnp.asarray(Hbs)
        Wbs = jnp.asarray(Wbs)

    R = rois.shape[0]
    O = output_size
    S = sampling_ratio if sampling_ratio > 0 else adaptive_max

    def align_chunk(args):
        r_boxes, r_lvl, r_view = args                           # [Rc, ...]
        sc = Ss[r_lvl]                                          # [Rc]
        H = Hs[r_lvl]
        W = Ws[r_lvl]
        x1 = r_boxes[:, 0] * sc - 0.5
        y1 = r_boxes[:, 1] * sc - 0.5
        rw = (r_boxes[:, 2] - r_boxes[:, 0]) * sc
        rh = (r_boxes[:, 3] - r_boxes[:, 1]) * sc
        Rc = r_boxes.shape[0]
        xs, wx, divx = _axis_grid(x1, rw, O, sampling_ratio, adaptive_max)
        ys, wy, divy = _axis_grid(y1, rh, O, sampling_ratio, adaptive_max)
        X = jnp.broadcast_to(xs[:, None, :],
                             (Rc, O * S, O * S)).reshape(Rc, -1)
        Y = jnp.broadcast_to(ys[:, :, None],
                             (Rc, O * S, O * S)).reshape(Rc, -1)
        W_s = (wy[:, :, None] * wx[:, None, :]).reshape(Rc, -1)
        div = divy * divx
        Wf = W[:, None].astype(X.dtype)
        Hf = H[:, None].astype(X.dtype)
        inside = (X > -1.0) & (X < Wf) & (Y > -1.0) & (Y < Hf)
        X = jnp.clip(X, 0.0, Wf - 1)
        Y = jnp.clip(Y, 0.0, Hf - 1)
        x0 = jnp.floor(X); y0 = jnp.floor(Y)
        lx = (X - x0)[..., None]; ly = (Y - y0)[..., None]
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        w00 = (1 - ly) * (1 - lx)
        w01 = (1 - ly) * lx
        w10 = ly * (1 - lx)
        w11 = ly * lx

        if block_layout:
            Hb = Hbs[r_lvl][:, None]
            Wb = Wbs[r_lvl][:, None]
            buf = (y0i % 2) * 2 + (x0i % 2)                    # [Rc, P]
            row = lvl_off[r_lvl][:, None] + \
                ((buf * V + r_view[:, None]) * Hb + y0i // 2) * Wb + x0i // 2
            cells = flat[row]                                  # [Rc, P, 4C]
            c00, c01, c10, c11 = jnp.split(cells, 4, axis=-1)
            out = w00 * c00 + w01 * c01 + w10 * c10 + w11 * c11
        else:
            base = lvl_off[r_lvl] + r_view * (H * W)
            x1i = jnp.minimum(x0 + 1, Wf - 1).astype(jnp.int32)
            y1i = jnp.minimum(y0 + 1, Hf - 1).astype(jnp.int32)

            def g(yi, xi):
                return flat[base[:, None] + yi * W[:, None] + xi]

            out = w00 * g(y0i, x0i) + w01 * g(y0i, x1i) + \
                w10 * g(y1i, x0i) + w11 * g(y1i, x1i)
        out = jnp.where(inside[..., None], out, 0.0)
        out = (out * W_s[..., None]).reshape(Rc, O, S, O, S, C)
        return out.sum(axis=(2, 4)) / div[:, None, None, None]

    if R <= chunk:
        return align_chunk((rois, lvl, view_idx.astype(jnp.int32)))
    nb = -(-R // chunk)
    pad = nb * chunk - R
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))
    lvl_p = jnp.pad(lvl, (0, pad))
    view_p = jnp.pad(view_idx.astype(jnp.int32), (0, pad))
    out = jax.lax.map(align_chunk,
                      (rois_p.reshape(nb, chunk, 4),
                       lvl_p.reshape(nb, chunk),
                       view_p.reshape(nb, chunk)))
    return out.reshape(nb * chunk, O, O, C)[:R]
