"""RoIAlign as a Pallas patch-DMA kernel (separable bilinear on the MXU).

XLA gathers on TPU run at ~40 GB/s effective (descriptor-bound); the R-CNN
stage's 12k RoIs x 196 samples cost ~120 ms.  This kernel instead:

  * stacks ALL FPN levels into one [V, sum_H, W_max, C] buffer (levels padded
    to a common width; reads past a level's true H/W are harmless because
    the interpolation hat weights are exactly zero there),
  * DMAs one contiguous [PH, PW, C] patch per RoI at its ROUTED level's row
    offset (large sequential rows -> near-peak bandwidth; per-RoI level
    parameters come in as scalar prefetch, so ONE kernel serves all levels),
  * evaluates bilinear interpolation SEPARABLY: the weights factor into 1D
    hat functions, so the 14x14 sample lattice is two small MXU matmuls
      tmp = Ay [S, PH] @ patch [PH, PW*C];  out = Ax [S, PW] . tmp
  * runs twice - half patches for small RoIs (most detections), full for the
    rest - plus a tiny exact XLA-gather fallback for RoIs whose long side
    exceeds the patch (mmdet routes by sqrt(area), so extreme-aspect RoIs
    can span arbitrarily many cells).

Inference / no-grad paths only: tangents are ZERO (custom_jvp); training
uses the differentiable XLA gather align.
"""
from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# adaptive (sampling_ratio <= 0) in-kernel sample bound: pass routing caps
# per-axis bins at (PASS_SIZES[-1] - 3) / 7 = 8.71 cells, so ceil <= 9 and
# the masked static loop is EXACT for every pass-routed roi (overflow rois
# take the XLA lattice path with its own bound)
ADAPTIVE_SMAX = 9


def _pass_smax(ph: int, O: int, S: int) -> int:
    """Adaptive sample-slot count needed by a pass: a pass-`ph` roi has
    long side <= ph - 3 cells (routing: `cells > ph - 3` escalates), so
    per-axis bin <= (ph - 3) / O and ceil(bin) <= ceil((ph - 3) / O).
    The small-RoI passes (the bulk of detect RoIs) thus run 2 hat slots,
    not the global worst case 9 - adaptivity costs them nothing."""
    if S > 0:
        return S
    return min(ADAPTIVE_SMAX, -(-(ph - 3) // O))


def _hat_axes(y1, x1, bh, bw, H, W, oy, ox, qio, cell_y, cell_x, S, act=1.0,
              smax=ADAPTIVE_SMAX):
    """Shared hat-profile accumulation for the slab/patch kernels.

    Returns (by, bx): per-axis averaged bilinear hat weights with the
    sample-mean divisor AND `act` (y axis only) folded in, so
    out = by @ patch @ bx^T is the final RoIAlign value.  S > 0 = static
    sample count; S <= 0 = mmcv adaptive per-RoI S = ceil(bin), realized
    as `smax` masked slots (weights fold the true per-RoI divisor,
    never a trailing broadcast - Mosaic rejects sublane+lane broadcasts
    of [n, 1, 1] scalars onto [n, O, cells]).  Callers pass the smallest
    exact smax (`_pass_smax`) - the loop is the kernels' VPU hot spot."""
    f32 = jnp.float32
    if S > 0:
        nmax = S
        wy = act * (1.0 / S)
        wx = 1.0 / S
        syf = sxf = None
    else:
        nmax = smax
        syf = jnp.clip(jnp.ceil(bh), 0.0, float(nmax))
        sxf = jnp.clip(jnp.ceil(bw), 0.0, float(nmax))
        syc = jnp.maximum(syf, 1.0)
        sxc = jnp.maximum(sxf, 1.0)
        wy = act / syc
        wx = 1.0 / sxc
    by = None
    bx = None
    for s in range(nmax):
        if S > 0:
            fy = fx = (s + 0.5) / S
        else:
            fy = (s + 0.5) / syc
            fx = (s + 0.5) / sxc
        ys = y1 + (qio + fy) * bh
        xs = x1 + (qio + fx) * bw
        in_y = (ys > -1.0) & (ys < H)
        in_x = (xs > -1.0) & (xs < W)
        if S <= 0:
            in_y = in_y & (syf > s)
            in_x = in_x & (sxf > s)
        my = in_y.astype(f32) * wy
        mx = in_x.astype(f32) * wx
        ys = jnp.clip(ys, 0.0, H - 1) - oy
        xs = jnp.clip(xs, 0.0, W - 1) - ox
        ty = jnp.maximum(1.0 - jnp.abs(ys - cell_y), 0.0) * my
        tx = jnp.maximum(1.0 - jnp.abs(xs - cell_x), 0.0) * mx
        by = ty if by is None else by + ty
        bx = tx if bx is None else bx + tx
    return by, bx


def _band_weights(lo, ext, origin, n_cells: int, bound, O: int, S: int,
                  amax: int):
    """Per-RoI hat-weight matrices [K, O, n_cells] over a band window.

    lo/ext: roi origin/extent in level-local cells; origin: the band's
    level-local cell origin (positions are shifted by it); bound: the
    level's true extent (per-roi border tests/clamps).  Mirrors
    _separable_weights but with per-roi bound and window origin, so the
    contraction By @ band @ Bx^T over gathered band cells reproduces
    roi_align exactly (incl. mmcv adaptive S = ceil(bin) when S <= 0,
    UNCLAMPED as long as amax >= the true per-axis worst case)."""
    from .roi_align import _axis_grid
    K = lo.shape[0]
    xs, wt, div = _axis_grid(lo, ext, O, S, amax)        # [K, O*S']
    xs = xs.reshape(K, O, -1)
    wt = wt.reshape(K, O, -1)
    inside = (xs > -1.0) & (xs < bound[:, None, None])
    xc = jnp.clip(xs, 0.0, bound[:, None, None] - 1) - origin[:, None, None]
    cells = jnp.arange(n_cells, dtype=xs.dtype)
    hat = jnp.maximum(1.0 - jnp.abs(xc[..., None] - cells), 0.0)
    hat = hat * (inside * wt)[..., None]
    return hat.sum(-2) / div[:, None, None]              # [K, O, n_cells]


def _compact_idx(over: jnp.ndarray, k: int):
    """Indices of the first k set bits of `over` [R], gather formulation.

    The scatter compaction (`zeros(k+1).at[slot].set(arange(R))`) lowers
    to a while loop on TPU (~2 ms per instance; the honest-fixture train
    trace showed ~15 ms of such whiles across the overflow branches).
    This is the same chunked-cumsum gather form as
    pallas_dcn._overflow_select.  Returns (sel [k] int32 - unset slots
    point at R-1 and MUST be masked by the caller's `arange(k) < n_over`
    - and n_over)."""
    R = over.shape[0]
    S = 512
    ncp = -(-R // S) * S
    m = jnp.pad(over, (0, ncp - R)).reshape(-1, S)
    within = jnp.cumsum(m.astype(jnp.int32), axis=1)
    counts = within[:, -1]
    end = jnp.cumsum(counts)
    base = end - counts
    j = jnp.arange(k, dtype=jnp.int32)
    chunk_id = jnp.sum((end[None, :] <= j[:, None]).astype(jnp.int32),
                       axis=1)
    chunk_id = jnp.minimum(chunk_id, m.shape[0] - 1)
    r = j - base[chunk_id]
    rows = within[chunk_id]
    col = jnp.sum((rows <= r[:, None]).astype(jnp.int32), axis=1)
    idx = chunk_id * S + jnp.minimum(col, S - 1)
    return (jnp.where(j < end[-1], idx, R - 1).astype(jnp.int32),
            end[-1])


def _rows_gather(flat: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """Row gather whose TRANSPOSE is a one-hot matmul, not a scatter-add.

    The autodiff scatter of the overflow band gather (K*BAND rows back
    into the [V*Hslab, Wmax*C] slab) lowers to a serial while loop on TPU
    (~15 ms/step in the honest-fixture train trace - duplicate-index
    handling serializes).  E^T @ g is one [KB, Nr]^T x [KB, D] MXU dot
    with f32 accumulation - at least as exact as the bf16 scatter-add it
    replaces, and ~10x faster."""
    if os.environ.get('MV2D_ALIGN_OH_VJP', '1') != '1':
        return flat[rows]
    return _make_rows_gather(flat.shape[0], flat.dtype.name)(flat, rows)


@functools.lru_cache(maxsize=None)
def _make_rows_gather(Nr: int, dt: str):
    @jax.custom_vjp
    def f(fl, rw):
        return fl[rw]

    def fwd(fl, rw):
        return f(fl, rw), rw

    def bwd(rw, g):
        K, B = rw.shape
        gf = g.reshape(K * B, -1)
        E = (rw.reshape(-1)[:, None] ==
             jnp.arange(Nr)[None, :]).astype(gf.dtype)      # [KB, Nr]
        dflat = jax.lax.dot_general(
            E, gf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.dtype(dt))
        return dflat, np.zeros(rw.shape, dtype=jax.dtypes.float0)

    f.defvjp(fwd, bwd)
    return f


def _overflow_align_stacked(stacked: jnp.ndarray, row_offs: Sequence[int],
                            Hs: Sequence[int], Ws: Sequence[int],
                            strides: Sequence[int], rois: jnp.ndarray,
                            lvl: jnp.ndarray, view: jnp.ndarray,
                            O: int, S: int, mode: str = 'both'
                            ) -> jnp.ndarray:
    """EXACT band-dense RoIAlign for the K overflow RoIs, reading the SAME
    level-stacked [V, Hslab, Wmax, C] buffer the Pallas kernel uses.

    Overflow rois are extreme-aspect (long side > 61 cells at the routed
    level): level routing targets sqrt(area) in [14, 28) cells, so
    area < 784 and the SHORT side < 784/61 < 13 cells.  Instead of a
    point-sample lattice (whose 4-corner gathers are descriptor-bound:
    the symmetric adaptive lattice cost ~10 ms/step at the detect stage),
    the roi's full cell FOOTPRINT is gathered as a short-side band and
    contracted with per-axis hat-weight matrices (By @ band @ Bx^T):

      * WIDE rois: 16 full slab rows (one [Wmax*C] contiguous descriptor
        per row - ~16 descriptors/roi),
      * TALL rois: a 24-column band as 3 8-cell granules per slab row
        ([8C]-contiguous descriptors) over BAND_Y rows,

    both computed for every roi and selected per-roi (canonical where).
    Adaptive sampling (S <= 0) is UNCLAMPED here - the hat weights fold
    the true per-axis ceil(bin) up to the level-geometry worst case
    (long bin <= ceil(Wmax/O) resp. ceil(max H/O)) - so this path is
    EXACT mmcv semantics, tighter than the lattice clamp it replaces."""
    V, Hslab, Wmax, C = stacked.shape
    K = rois.shape[0]
    dt = rois.dtype
    sc = jnp.asarray([1.0 / s for s in strides], dt)[lvl]
    H = jnp.asarray(Hs, dt)[lvl]
    W = jnp.asarray(Ws, dt)[lvl]
    ro = jnp.asarray(row_offs)[lvl]                      # [K] int
    x1 = rois[:, 0] * sc - 0.5
    y1 = rois[:, 1] * sc - 0.5
    rw = (rois[:, 2] - rois[:, 0]) * sc
    rh = (rois[:, 3] - rois[:, 1]) * sc
    wide = rw >= rh
    # mode='wide'/'tall': the caller bucket-compacted the overflow rois by
    # orientation, so only ONE band shape is gathered (the dual-path form
    # gathered ~2x the bytes and where-selected; with K=256 slots that was
    # >1 GB of gather per call in the synthetic train bench)

    # static short-side bounds.  Non-top levels: level routing targets
    # sqrt(area) in [14, 28) cells, so overflow (long > 61) implies
    # short < 784/61 < 13.  The COARSEST level clamps area from above, so
    # if ITS long dimension exceeds the 61-cell pass cap, overflow rois
    # routed there can be fat in both axes up to the map itself.
    short_y = 13 if Ws[-1] <= 61 else max(13, Hs[-1])    # wide rois' rows
    short_x = 13 if Hs[-1] <= 61 else max(13, Ws[-1])    # tall rois' cols
    BAND = min(Hslab, -(-(short_y + 3) // 8) * 8)        # wide: band rows
    BAND_Y = min(Hslab, -(-max(Hs) // 8) * 8)            # tall: long extent
    # tall: 8-col granules; capped at the slab width for narrow (test-size)
    # maps - with GRAN == Wg the band covers every column, so the cap is
    # exact and the gather never indexes past the granule table
    GRAN = min(-(-(short_x + 9) // 8), Wmax // 8)
    amax_x = -(-Wmax // O)                               # long-axis ceils
    amax_y = -(-max(Hs) // O)
    amax_sy = max(-(-short_y // O), S)                   # short-axis ceils
    amax_sx = max(-(-short_x // O), S)

    out_w = out_t = None
    if mode in ('both', 'wide'):
        # ---- WIDE path: 16 full rows starting at the band origin
        py = jnp.clip(jnp.floor(y1).astype(jnp.int32),
                      jnp.minimum(-ro, 0), Hslab - ro - BAND)
        rows = (view * Hslab + ro + py)[:, None] + jnp.arange(BAND)
        band_w = _rows_gather(stacked.reshape(V * Hslab, Wmax * C), rows)
        band_w = band_w.reshape(K, BAND, Wmax, C)
        By_w = _band_weights(y1, rh, py.astype(dt), BAND, H, O, S,
                             amax_sy)
        Bx_w = _band_weights(x1, rw, jnp.zeros_like(x1), Wmax, W, O, S,
                             amax_x)
        t = jnp.einsum('koi,kiwc->kowc', By_w.astype(stacked.dtype),
                       band_w,
                       preferred_element_type=jnp.float32
                       ).astype(stacked.dtype)
        out_w = jnp.einsum('kjw,kiwc->kijc', Bx_w.astype(stacked.dtype),
                           t,
                           preferred_element_type=jnp.float32)
        if mode == 'wide':
            return out_w

    if mode in ('both', 'tall'):
        # ---- TALL path: GRAN 8-col granules per row over BAND_Y rows
        Wg = Wmax // 8
        gx = jnp.clip(jnp.floor(x1).astype(jnp.int32) // 8, 0,
                      max(Wg - GRAN, 0))
        py2 = jnp.clip(jnp.floor(y1).astype(jnp.int32),
                       jnp.minimum(-ro, 0), Hslab - ro - BAND_Y)
        gr = ((view * Hslab + ro + py2)[:, None, None]
              + jnp.arange(BAND_Y)[None, :, None]) * Wg \
            + (gx[:, None, None] + jnp.arange(GRAN)[None, None, :])
        band_t = stacked.reshape(V * Hslab * Wg, 8 * C)[gr]
        band_t = band_t.reshape(K, BAND_Y, GRAN * 8, C)
        By_t = _band_weights(y1, rh, py2.astype(dt), BAND_Y, H, O, S,
                             amax_y)
        Bx_t = _band_weights(x1, rw, (gx * 8).astype(dt), GRAN * 8, W, O,
                             S, amax_sx)
        s_ = jnp.einsum('kji,kyic->kjyc', Bx_t.astype(stacked.dtype),
                        band_t,
                        preferred_element_type=jnp.float32
                        ).astype(stacked.dtype)
        out_t = jnp.einsum('kiy,kjyc->kijc', By_t.astype(stacked.dtype),
                           s_,
                           preferred_element_type=jnp.float32)
        if mode == 'tall':
            return out_t

    return jnp.where(wide[:, None, None, None], out_w, out_t)


def _kernel(row_ref, px_ref, view_ref, active_ref, y1_ref, x1_ref,
            bh_ref, bw_ref, hf_ref, wf_ref, py_ref,
            feat_ref, out_ref, patch_scratch, sems, *,
            nr: int, ph: int, pw: int, O: int, S: int):
    """One grid step processes `nr` rois, DOUBLE-BUFFERED across steps:
    step i waits on the patches step i-1 prefetched into buffer i%2 while
    kicking off step i+1's DMAs into the other buffer (per-RoI patch DMAs
    have ~10us latency; without cross-step overlap the grid serializes on
    it and the MXU idles).

    scalar prefetch (all [R]): row (stacked-buffer row origin), px (8-aligned
    col origin), view, active (int32); y1/x1/bh/bw (sample geometry, cells),
    hf/wf (the routed level's true H/W for border tests), py (patch row
    origin within the level) as f32/int32 1D arrays (2D scalar operands pad
    their minor dim to 128 lanes and blow the 1 MB SMEM budget).
    """
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    base = step * nr

    def dma(j, buf, boff):
        # px is constructed 8-aligned on the host (Mosaic tiling constraint
        # on the second-minor dim); multiple_of carries the proof
        return pltpu.make_async_copy(
            feat_ref.at[view_ref[boff + j],
                        pl.ds(row_ref[boff + j], ph),
                        pl.ds(pl.multiple_of(px_ref[boff + j], 8), pw), :],
            patch_scratch.at[buf, j],
            sems.at[buf, j])

    cur = step % 2
    nxt = (step + 1) % 2

    @pl.when(step == 0)
    def _():
        for j in range(nr):
            @pl.when(active_ref[j] > 0)
            def _():
                dma(j, 0, 0).start()

    @pl.when(step + 1 < nsteps)
    def _():
        nbase = (step + 1) * nr
        for j in range(nr):
            @pl.when(active_ref[nbase + j] > 0)
            def _():
                dma(j, nxt, nbase).start()

    # fully-inactive steps (the caller sorts rois so each pass's actives
    # are one contiguous run) skip DMA waits, weights and dots entirely
    tot = active_ref[base]
    for j in range(1, nr):
        tot = tot + active_ref[base + j]

    @pl.when(tot == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(tot > 0)
    def _():
        # hat-SUM weight form (as the slab kernels): the per-bin sample
        # average folds into [O, cells] hat profiles, so the dots contract
        # O rows regardless of the sample count - adaptive sampling costs
        # only the (pass-capped) hat loop, never extra MXU work
        qio = jax.lax.broadcasted_iota(jnp.int32, (O, 1), 0) \
            .astype(jnp.float32)
        cell_y = jax.lax.broadcasted_iota(jnp.int32, (O, ph),
                                          1).astype(jnp.float32)
        cell_x = jax.lax.broadcasted_iota(jnp.int32, (O, pw),
                                          1).astype(jnp.float32)
        # per-roi weight blocks built in 2D (scalar broadcasts), then
        # stacked - Mosaic supports 2D scalar math + stacking, not 1D->3D
        # reshapes
        ays, axs = [], []
        for j in range(nr):
            by, bx = _hat_axes(
                y1_ref[base + j], x1_ref[base + j], bh_ref[base + j],
                bw_ref[base + j], hf_ref[base + j], wf_ref[base + j],
                py_ref[base + j].astype(jnp.float32),
                px_ref[base + j].astype(jnp.float32),
                qio, cell_y, cell_x, S, smax=_pass_smax(ph, O, S))
            ays.append(by)
            axs.append(bx)
        ay = jnp.stack(ays)                               # [nr, O, ph]
        ax = jnp.stack(axs)                               # [nr, O, pw]

        for j in range(nr):
            @pl.when(active_ref[base + j] > 0)
            def _():
                pltpu.make_async_copy(patch_scratch.at[cur, j],
                                      patch_scratch.at[cur, j],
                                      sems.at[cur, j]).wait()

            # inactive slots hold uninitialized VMEM (NaN bit patterns
            # would poison the batched dot even under zero weights)
            @pl.when(active_ref[base + j] == 0)
            def _():
                patch_scratch[cur, j] = jnp.zeros_like(patch_scratch[cur, j])

        # one batched pair of dots over all nr rois (tiny per-roi matmuls
        # are dispatch-bound; batching amortizes the MXU setup)
        patches = patch_scratch[cur]                      # [nr, ph, pw, C]
        C = patches.shape[-1]
        tmp = jax.lax.dot_general(
            ay.astype(patches.dtype), patches.reshape(nr, ph, pw * C),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [nr, O, pw*C]
        tmp = tmp.reshape(nr, O, pw, C).astype(patches.dtype)
        tmp = tmp.transpose(0, 2, 1, 3).reshape(nr, pw, O * C)
        full = jax.lax.dot_general(
            ax.astype(patches.dtype), tmp,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [nr, Ox, Oy*C]
        out = full.reshape(nr, O, O, C).transpose(0, 2, 1, 3)
        # inactive slots already yield exact zeros: their patch was zeroed
        # above and the hat weights are finite, so no explicit mask needed
        out_ref[:] = out.astype(out_ref.dtype)


def _stacked_align(stacked: jnp.ndarray, scalars: dict, active: jnp.ndarray,
                   output_size: int, sampling_ratio: int, nr: int,
                   ph: int, pw: int, interpret: bool) -> jnp.ndarray:
    """Run the kernel over all rois with per-roi level params."""
    R = active.shape[0]
    O, S = output_size, sampling_ratio
    C = stacked.shape[-1]
    nb = -(-R // nr)
    pad = nb * nr - R

    def p(x, val=0):
        return jnp.pad(x, (0, pad), constant_values=val) if pad else x

    args = [p(scalars['row']), p(scalars['px']), p(scalars['view']),
            p(active.astype(jnp.int32)), p(scalars['y1']), p(scalars['x1']),
            p(scalars['bh']), p(scalars['bw']), p(scalars['hf']),
            p(scalars['wf']), p(scalars['py'])]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nr, O, O, C), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, nr, ph, pw, C), stacked.dtype),
                        pltpu.SemaphoreType.DMA((2, nr))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nr=nr, ph=ph, pw=pw, O=O, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * nr, O, O, C), stacked.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args, stacked)
    return out[:R]


def pallas_multilevel_roi_align(feats: Sequence[jnp.ndarray],
                                rois: jnp.ndarray, view_idx: jnp.ndarray,
                                strides: Sequence[int],
                                output_size: int = 7,
                                sampling_ratio: int = 2,
                                finest_scale: float = 56.0,
                                rois_per_step: int = 8,
                                patch: int = 32,
                                overflow_bucket: int = 1024,
                                interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in replacement for ops.roi_align.multilevel_roi_align
    (inference / no-grad paths only - tangents are ZERO)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    if not interpret and feats[0].shape[-1] % 128 != 0:
        # Mosaic only supports the kernel's [ph, pw, C] -> [ph, pw*C] merge
        # when C fills whole 128-lane registers; small-channel configs
        # (tests / tiny models) take the exact XLA gather path instead
        from .roi_align import multilevel_roi_align
        return multilevel_roi_align(feats, rois, view_idx, strides,
                                    output_size, sampling_ratio, finest_scale)
    fn = _make_pma(tuple(strides), output_size, sampling_ratio,
                   finest_scale, rois_per_step, patch, overflow_bucket,
                   interpret)
    return fn(tuple(feats), rois, view_idx)


@functools.lru_cache(maxsize=None)
def _make_pma(strides, output_size, sampling_ratio, finest_scale,
              rois_per_step, patch, overflow_bucket, interpret):
    """custom_jvp wrapper with ZERO tangents (no-grad usage only)."""

    @jax.custom_jvp
    def f(feats, rois, view_idx):
        return _pma_impl(feats, rois, view_idx, strides, output_size,
                         sampling_ratio, finest_scale, rois_per_step, patch,
                         overflow_bucket, interpret)

    @f.defjvp
    def _jvp(primals, tangents):
        out = f(*primals)
        return out, jnp.zeros_like(out)

    return f


PASS_SIZES = (16, 32, 64)   # patch rows per pass; cols = rows + 8
WIDE_PH = 16                # wide-band pass: [WIDE_PH, Wmax] patches
TALL_PW = 24                # tall-band pass: [ph_tall, TALL_PW] patches


def _pass_shapes(g, O: int, S: int):
    """Static (ph, pw, smax) per kernel pass: the square PASS_SIZES plus
    the two band passes (wide [WIDE_PH, Wmax], tall [ph_tall, tall_pw]).
    smax is the per-pass adaptive hat-slot bound - the bands' long axis
    needs up to ceil(extent/O) slots, far beyond ADAPTIVE_SMAX."""
    sq = tuple((ph, ph + 8, _pass_smax(ph, O, S)) for ph in PASS_SIZES)
    if S > 0:
        sw = st = S
    else:
        sw = -(-g['Wmax'] // O)
        st = -(-g['ph_tall'] // O)
    return sq + ((WIDE_PH, g['Wmax'], sw), (g['ph_tall'], g['tall_pw'], st))


def _pma_impl(feats, rois, view_idx, strides, output_size, sampling_ratio,
              finest_scale, rois_per_step, patch, overflow_bucket,
              interpret):
    L = len(feats)
    V, _, _, C = feats[0].shape
    R = rois.shape[0]
    area = jnp.clip((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]),
                    0.0, None)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(area) / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, L - 1).astype(jnp.int32)
    sc_all = jnp.asarray([1.0 / s for s in strides], dtype=rois.dtype)

    # ---- route each roi to the tightest patch that holds it, then SORT so
    # every pass sees one contiguous active run: per-roi patch DMA is the
    # dominant cost, so bytes moved must track actual roi size, and fully
    # inactive grid steps (the kernel skips them) must be contiguous
    cells = jnp.maximum(rois[:, 2] - rois[:, 0], rois[:, 3] - rois[:, 1]) \
        * sc_all[lvl]
    pass_id = jnp.zeros((R,), jnp.int32)
    for ph in PASS_SIZES:
        pass_id = pass_id + (cells > ph - 3)
    order = jnp.argsort(pass_id, stable=True)
    rois_s = rois[order]
    view_s = view_idx[order]
    lvl_s = lvl[order]
    pass_s = pass_id[order]

    # ---- stacked buffer: levels along H, padded to a common (8-aligned) W
    Wmax = -(-max(f.shape[2] for f in feats) // 8) * 8
    parts, row_offs, off = [], [], 0
    Hs_c, Ws_c = [], []
    for f, s in zip(feats, strides):
        Hl, Wl = f.shape[1], f.shape[2]
        parts.append(jnp.pad(f, ((0, 0), (0, 0), (0, Wmax - Wl), (0, 0))))
        row_offs.append(off)
        off += Hl
        Hs_c.append(Hl)
        Ws_c.append(Wl)
    # tail pad so a patch starting at the last level stays in-bounds
    ph_tail = min(PASS_SIZES[-1], off)
    parts.append(jnp.zeros((V, ph_tail, Wmax, C), feats[0].dtype))
    stacked = jnp.concatenate(parts, axis=1)
    row_off_t = jnp.asarray(row_offs)[lvl_s]
    H_t = jnp.asarray(Hs_c)[lvl_s]
    W_t = jnp.asarray(Ws_c)[lvl_s]
    sc = sc_all[lvl_s]

    # ---- per-roi geometry at the routed level (sorted order)
    O = output_size
    x1 = rois_s[:, 0] * sc - 0.5
    y1 = rois_s[:, 1] * sc - 0.5
    bw = (rois_s[:, 2] - rois_s[:, 0]) * sc / O
    bh = (rois_s[:, 3] - rois_s[:, 1]) * sc / O

    def scalars_for(ph, pw):
        py = jnp.clip(jnp.floor(y1).astype(jnp.int32), 0,
                      jnp.maximum(H_t - ph, 0))
        px = jnp.floor(x1).astype(jnp.int32) // 8 * 8
        px = jnp.clip(px, 0, max(Wmax - pw, 0))
        return dict(row=(row_off_t + py).astype(jnp.int32),
                    px=px.astype(jnp.int32),
                    view=view_s.astype(jnp.int32),
                    y1=y1.astype(jnp.float32), x1=x1.astype(jnp.float32),
                    bh=bh.astype(jnp.float32), bw=bw.astype(jnp.float32),
                    hf=H_t.astype(jnp.float32), wf=W_t.astype(jnp.float32),
                    py=py.astype(jnp.int32))

    out_s = None
    for p, ph in enumerate(PASS_SIZES):
        ph_eff = min(ph, off)
        pw = ph + 8
        o = _stacked_align(stacked, scalars_for(ph_eff, pw), pass_s == p,
                           O, sampling_ratio, rois_per_step, ph_eff, pw,
                           interpret)
        out_s = o if out_s is None else out_s + o
    inv = jnp.argsort(order)
    out = out_s[inv]

    if overflow_bucket > 0:
        # extreme-aspect rois (> 61 cells at their routed level) sit at the
        # END of the sorted order - exact XLA gather for up to K of them.
        # Tiered no-op / small / full bucket keyed on the actual count (the
        # band gathers cost ~4.5 MB of slab reads per SLOT, so bucket size
        # is the whole cost and overflow rois are rare)
        K = min(overflow_bucket, R)
        n_over = (pass_s == len(PASS_SIZES)).sum()

        def make_branch(k):
            def add_overflow(buf):
                sel = order[R - k:]
                ov = pass_s[R - k:] == len(PASS_SIZES)
                # gathers from the SAME stacked buffer the kernel reads (a
                # separate flattened table copy costs ~2 ms at full size)
                o_small = _overflow_align_stacked(
                    stacked, row_offs, Hs_c, Ws_c, strides, rois_s[R - k:],
                    lvl_s[R - k:], view_s[R - k:], output_size,
                    sampling_ratio)
                o_small = o_small * ov[:, None, None, None]
                return buf.at[sel].add(o_small.astype(buf.dtype))
            return add_overflow

        K1 = min(32, K)
        branches = [lambda b: b, make_branch(K1)]
        if K > K1:
            branches.append(make_branch(K))
        idx = jnp.minimum((n_over > 0).astype(jnp.int32)
                          + (n_over > K1).astype(jnp.int32),
                          len(branches) - 1)
        out = jax.lax.switch(idx, branches, out)
    return out


# --------------------------------------------------------------------------
# View-uniform slab-resident variant (the R-CNN stage: [V, P] proposals).
#
# Per-RoI patch DMAs are DMA-row-segment-rate bound (~5M strided segments/s:
# a [32, 40, C] patch costs 32 segments, so 12k RoIs serialize into tens of
# ms regardless of bytes).  Here the whole per-view level-stacked slab
# (~56 MB bf16 at 1408x512/C=256) is DMA'd into VMEM ONCE per view - a few
# huge contiguous segments - and every patch becomes a dynamic-offset VMEM
# read (H is the untiled major dim: any row offset; the col origin is
# 8-aligned).  RoIs are bucket-compacted per view so each grid step handles
# `nr` same-pass RoIs (pass = patch size class); steps of empty/overflow
# buckets write zeros and skip all reads.
# --------------------------------------------------------------------------


def _kernel_slab(step_pass_ref, row_ref, px_ref, active_ref, y1_ref, x1_ref,
                 bh_ref, bw_ref, hf_ref, wf_ref, py_ref,
                 *rest, nr: int, spv: int, shapes, O: int, S: int,
                 lvl_geo=None):
    """lvl_geo = static ((row_off, Hl, Wl8) per level): the slab is
    assembled IN-KERNEL with one DMA per level per view instead of reading
    a pre-concatenated [V, Hslab, Wmax, C] tensor - the XLA pad+concat
    slab build cost ~1.5 ms/step in the eval trace.  Column/row tails the
    DMAs never touch are zeroed ONCE at the first grid step (their hat
    weights are exactly zero - see _hat_axes border tests - so any finite
    value works, but uninitialized VMEM could be NaN)."""
    nl = len(lvl_geo)
    feat_refs = rest[:nl]
    out_ref, slab, sems = rest[nl], rest[nl + 1], rest[nl + 2]
    v = pl.program_id(0)
    i = pl.program_id(1)
    base = (v * spv + i) * nr
    Hslab, Wmax = slab.shape[0], slab.shape[1]

    @pl.when((v == 0) & (i == 0))
    def _():
        for off, Hl, Wl8 in lvl_geo:
            if Wl8 < Wmax:
                slab[off:off + Hl, Wl8:Wmax, :] = jnp.zeros(
                    (Hl, Wmax - Wl8, slab.shape[2]), slab.dtype)
        end = lvl_geo[-1][0] + lvl_geo[-1][1]
        if end < Hslab:
            slab[end:Hslab, :, :] = jnp.zeros(
                (Hslab - end, Wmax, slab.shape[2]), slab.dtype)

    @pl.when(i == 0)
    def _():
        cps = []
        for l, (off, Hl, Wl8) in enumerate(lvl_geo):
            cp = pltpu.make_async_copy(
                feat_refs[l].at[v],
                slab.at[pl.ds(off, Hl), pl.ds(0, Wl8)], sems.at[l])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

    sp = step_pass_ref[v * spv + i]
    # sample-mean FOLDED into the hat weights (linear, so exact): By[oy, p]
    # = (1/S) sum_s hat(ys[oy*S+s] - p)
    qio = jax.lax.broadcasted_iota(jnp.int32, (O, 1), 0).astype(jnp.float32)

    @pl.when(sp >= len(shapes))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    for p, (ph, pw, smax) in enumerate(shapes):
        # band passes have fat patches; chunk the stacked dots to bound
        # the in-step patch registers (same formula as _kernel_slab_bwd_v2)
        nrc = max(min(nr, (PASS_SIZES[-1] * (PASS_SIZES[-1] + 8) * nr)
                      // (ph * pw)), 1)
        while nr % nrc:
            nrc -= 1

        @pl.when(sp == p)
        def _(ph=ph, pw=pw, smax=smax, nrc=nrc):
            cell_y = jax.lax.broadcasted_iota(jnp.int32, (O, ph),
                                              1).astype(jnp.float32)
            cell_x = jax.lax.broadcasted_iota(jnp.int32, (O, pw),
                                              1).astype(jnp.float32)
            bys, bxs = [], []
            for j in range(nr):
                # act zeroes inactive slots (their slab reads are junk)
                act = (active_ref[base + j] > 0).astype(jnp.float32)
                by, bx = _hat_axes(
                    y1_ref[base + j], x1_ref[base + j], bh_ref[base + j],
                    bw_ref[base + j], hf_ref[base + j], wf_ref[base + j],
                    py_ref[base + j].astype(jnp.float32),
                    px_ref[base + j].astype(jnp.float32),
                    qio, cell_y, cell_x, S, act=act, smax=smax)
                bys.append(by)
                bxs.append(bx)
            for cb in range(nr // nrc):
                cbase = base + cb * nrc
                By = jnp.stack(bys[cb * nrc:(cb + 1) * nrc])  # [nrc, O, ph]
                Bx = jnp.stack(bxs[cb * nrc:(cb + 1) * nrc])  # [nrc, O, pw]
                pats = [slab[pl.ds(row_ref[cbase + j], ph),
                             pl.ds(pl.multiple_of(px_ref[cbase + j], 8),
                                   pw), :] for j in range(nrc)]
                patches = jnp.stack(pats)                 # [nrc, ph, pw, C]
                dt = patches.dtype
                C = patches.shape[-1]
                # merged-minor batched dots; a lane-flattened
                # [Hslab, Wmax*C] slab variant (2D patch slices, no
                # (pw, C)->lanes merge) was measured NEUTRAL-to-slower:
                # its 8-aligned row origins need 8-taller patches whose
                # extra dot work cancels the relayout saving (eval 9.49 ->
                # 9.33); the 3Dx4D and block-diagonal dot forms measure
                # the same as this form
                tmp = jax.lax.dot_general(
                    By.astype(dt), patches.reshape(nrc, ph, pw * C),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [nrc, Oy, pw*C]
                tmp = tmp.reshape(nrc, O, pw, C).astype(dt)
                tmp = tmp.transpose(0, 2, 1, 3).reshape(nrc, pw, O * C)
                full = jax.lax.dot_general(
                    Bx.astype(dt), tmp, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [nrc, Ox, Oy*C]
                full = full.reshape(nrc, O, O, C).transpose(0, 2, 1, 3)
                out_ref[0, pl.ds(cb * nrc, nrc)] = full.astype(
                    out_ref.dtype)


def _kernel_slab_v3(step_pass_ref, row_ref, px_ref, active_ref, y1_ref,
                    x1_ref, bh_ref, bw_ref, hf_ref, wf_ref, py_ref,
                    scat_ref, *rest, nr: int, spv: int, shapes, O: int,
                    S: int, lvl_geo):
    """Flat-2D batched-hat body: ONE set of ~30 [nr*8, cells] VPU ops per
    step instead of nr unrolled [O, cells] sets (v1) or [nrc, O, cells]
    3D broadcasts (v2, which lost to its own tiny-sublane tiling).

    The per-RoI scalars are expanded to row vectors with a one-hot MXU
    dot (E [nr*8, nr] @ scat [nr, 11] - exact: each row is 1.0 * v), the
    output-bin index rides rows as row % 8, and the hat build runs on
    fully-tiled [64, cells] 2D shapes.  Output bins are padded 7 -> 8;
    rows/cols with bin index 7 are garbage and sliced off at the end
    (their hat weights never touch kept values).  Slab assembly = in-kernel
    per-level DMAs as _kernel_slab."""
    nl = len(lvl_geo)
    feat_refs = rest[:nl]
    out_ref, slab, sems = rest[nl], rest[nl + 1], rest[nl + 2]
    v = pl.program_id(0)
    i = pl.program_id(1)
    base = (v * spv + i) * nr
    Hslab, Wmax = slab.shape[0], slab.shape[1]

    @pl.when((v == 0) & (i == 0))
    def _():
        for off, Hl, Wl8 in lvl_geo:
            if Wl8 < Wmax:
                slab[off:off + Hl, Wl8:Wmax, :] = jnp.zeros(
                    (Hl, Wmax - Wl8, slab.shape[2]), slab.dtype)
        end = lvl_geo[-1][0] + lvl_geo[-1][1]
        if end < Hslab:
            slab[end:Hslab, :, :] = jnp.zeros(
                (Hslab - end, Wmax, slab.shape[2]), slab.dtype)

    @pl.when(i == 0)
    def _():
        cps = []
        for l, (off, Hl, Wl8) in enumerate(lvl_geo):
            cp = pltpu.make_async_copy(
                feat_refs[l].at[v],
                slab.at[pl.ds(off, Hl), pl.ds(0, Wl8)], sems.at[l])
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()

    sp = step_pass_ref[v * spv + i]

    @pl.when(sp >= len(shapes))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    O8 = 8
    n8 = nr * O8
    rowid = jax.lax.broadcasted_iota(jnp.int32, (n8, 1), 0)
    qio = (rowid % O8).astype(jnp.float32)
    ezp = (rowid // O8 == jax.lax.broadcasted_iota(
        jnp.int32, (n8, nr), 1)).astype(jnp.float32)
    sv = jax.lax.dot_general(ezp, scat_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    def col(k):
        return sv[:, k:k + 1]                              # [n8, 1]

    act = (col(2) > 0).astype(jnp.float32)
    for p, (ph, pw, smax) in enumerate(shapes):
        nrc = max(min(nr, (PASS_SIZES[-1] * (PASS_SIZES[-1] + 8) * nr)
                      // (ph * pw)), 1)
        while nr % nrc:
            nrc -= 1

        @pl.when(sp == p)
        def _(ph=ph, pw=pw, smax=smax, nrc=nrc):
            cell_y = jax.lax.broadcasted_iota(jnp.int32, (n8, ph),
                                              1).astype(jnp.float32)
            cell_x = jax.lax.broadcasted_iota(jnp.int32, (n8, pw),
                                              1).astype(jnp.float32)
            by, bx = _hat_axes(col(3), col(4), col(5), col(6), col(7),
                               col(8), col(9), col(1), qio, cell_y,
                               cell_x, S, act=act, smax=smax)
            for cb in range(nr // nrc):
                cbase = base + cb * nrc
                pats = [slab[pl.ds(row_ref[cbase + j], ph),
                             pl.ds(pl.multiple_of(px_ref[cbase + j], 8),
                                   pw), :] for j in range(nrc)]
                patches = jnp.stack(pats)                 # [nrc, ph, pw, C]
                dt = patches.dtype
                C = patches.shape[-1]
                By = by.reshape(nr, O8, ph)[cb * nrc:(cb + 1) * nrc]
                Bx = bx.reshape(nr, O8, pw)[cb * nrc:(cb + 1) * nrc]
                tmp = jax.lax.dot_general(
                    By.astype(dt), patches.reshape(nrc, ph, pw * C),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [nrc, 8, pw*C]
                tmp = tmp.reshape(nrc, O8, pw, C).astype(dt)
                tmp = tmp.transpose(0, 2, 1, 3).reshape(nrc, pw, O8 * C)
                full = jax.lax.dot_general(
                    Bx.astype(dt), tmp, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [nrc, 8, 8*C]
                full = full.reshape(nrc, O8, O8, C).transpose(0, 2, 1, 3)
                out_ref[0, pl.ds(cb * nrc, nrc)] = \
                    full[:, :O, :O].astype(out_ref.dtype)


def _kernel_slab_v2(step_pass_ref, row_ref, px_ref, active_ref, y1_ref,
                    x1_ref, bh_ref, bw_ref, hf_ref, wf_ref, py_ref,
                    scat_ref, stacked_ref, out_ref, slab, sem, *,
                    nr: int, spv: int, shapes, O: int, S: int):
    """Fat-step body: the per-RoI hat-weight builds are BATCHED over the
    step's RoIs from a VMEM scalar block (scat_ref [1, nr, 11]) instead of
    an unrolled per-RoI python loop - the unrolled form's ~30 tiny [O, ph]
    VPU ops x nr made per-step cost superlinear in nr (nr=16 measured 42 ms
    vs 25 @ nr=8 for 12k RoIs), capping steps at nr=8.  Large passes chunk
    within the step to bound the stacked-patch registers."""
    v = pl.program_id(0)
    i = pl.program_id(1)
    base = (v * spv + i) * nr

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(stacked_ref.at[v], slab, sem)
        cp.start()
        cp.wait()

    sp = step_pass_ref[v * spv + i]

    @pl.when(sp >= len(shapes))
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # chunk sizes bound per-chunk patch registers to <= nr*16*24*C
    for p, (ph, pw, smax) in enumerate(shapes):
        nrc = max(min(nr, (16 * 24 * nr) // (ph * pw)), 1)
        while nr % nrc:
            nrc -= 1

        @pl.when(sp == p)
        def _(ph=ph, pw=pw, smax=smax, nrc=nrc):
            qio = jax.lax.broadcasted_iota(
                jnp.int32, (1, O, 1), 1).astype(jnp.float32)
            cell_y = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, ph), 2).astype(jnp.float32)
            cell_x = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, pw), 2).astype(jnp.float32)
            for chunk in range(nr // nrc):
                cbase = base + chunk * nrc
                svb = scat_ref[0, pl.ds(chunk * nrc, nrc), :]  # [nrc, 11]

                def col(k):
                    return svb[:, k][:, None, None]
                act = (col(2) > 0).astype(jnp.float32)
                # act and divisors fold into the [nrc, O, 1] per-sample
                # masks inside _hat_axes: Mosaic rejects a (1,1)->(O,ph)
                # sublane+lane broadcast
                By, Bx = _hat_axes(col(3), col(4), col(5), col(6),
                                   col(7), col(8), col(9), col(1),
                                   qio, cell_y, cell_x, S, act=act,
                                   smax=smax)
                pats = [slab[pl.ds(row_ref[cbase + j], ph),
                             pl.ds(pl.multiple_of(px_ref[cbase + j], 8),
                                   pw), :] for j in range(nrc)]
                patches = jnp.stack(pats)                 # [nrc, ph, pw, C]
                dt = patches.dtype
                C = patches.shape[-1]
                tmp = jax.lax.dot_general(
                    By.astype(dt), patches.reshape(nrc, ph, pw * C),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [nrc, Oy, pw*C]
                tmp = tmp.reshape(nrc, O, pw, C).astype(dt)
                tmp = tmp.transpose(0, 2, 1, 3).reshape(nrc, pw, O * C)
                full = jax.lax.dot_general(
                    Bx.astype(dt), tmp, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [nrc, Ox, Oy*C]
                full = full.reshape(nrc, O, O, C).transpose(0, 2, 1, 3)
                out_ref[0, pl.ds(chunk * nrc, nrc)] = full.astype(
                    out_ref.dtype)


def pallas_roi_align_views(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                           strides: Sequence[int], output_size: int = 7,
                           sampling_ratio: int = 2,
                           finest_scale: float = 56.0,
                           rois_per_step: int = 8,
                           overflow_bucket: int = 256,
                           interpret: bool | None = None,
                           compacted: bool = False,
                           v2: bool | None = None):
    """RoIAlign for per-view proposal tensors: rois [V, P, 4] -> output
    [V, P, O, O, C].  Inference only (zero tangents).

    compacted=True returns (out [V, Pp, O, O, C], pos [V, P] int32) with
    RoIs in the kernel's bucket-compacted slot order (out[v, pos[v, p]] is
    RoI p of view v; Pp >= P includes per-pass padding slots).  Per-RoI
    consumers (e.g. the R-CNN head) can run on the compacted tensor and
    un-permute their small outputs instead - the [V, P, O, O, C]
    un-permute gather moves ~150 MB (~2 ms at full size)."""
    import jax as _jax
    if interpret is None:
        interpret = _jax.default_backend() != 'tpu'
    ob_env = os.environ.get('MV2D_ALIGN_OVERFLOW_K')
    if ob_env is not None:
        # A/B knob: cap (or 0 = disable) the exact-overflow buckets to
        # attribute their cost; accuracy-affecting, measurement use only
        overflow_bucket = min(overflow_bucket, int(ob_env))
    s_env = os.environ.get('MV2D_ALIGN_FIXED_S')
    if s_env:
        # A/B knob: force a fixed sample count (e.g. 2 = mmcv
        # sampling_ratio=2) to price the exact adaptive ceil(bin)
        # semantics; accuracy-affecting, measurement use only
        sampling_ratio = int(s_env)
    if not interpret and feats[0].shape[-1] % 128 != 0:
        # C must fill whole 128-lane registers (Mosaic reshape rule);
        # small-channel configs take XLA gather
        from .roi_align import multilevel_roi_align
        V, P = rois.shape[:2]
        vi = jnp.repeat(jnp.arange(V), P)
        out = multilevel_roi_align(feats, rois.reshape(V * P, 4), vi,
                                   strides, output_size, sampling_ratio,
                                   finest_scale)
        out = out.reshape(V, P, *out.shape[1:])
        if compacted:
            return out, jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32),
                                         (V, P))
        return out
    if v2 is None:
        v2 = os.environ.get('MV2D_ALIGN_V2', '0') == '1'
    fn = _make_prv(tuple(strides), output_size, sampling_ratio, finest_scale,
                   rois_per_step, overflow_bucket, interpret, compacted, v2)
    if compacted:
        out, posf = fn(tuple(feats), rois)
        return out, posf.astype(jnp.int32)
    return fn(tuple(feats), rois)


@functools.lru_cache(maxsize=None)
def _make_prv(strides, output_size, sampling_ratio, finest_scale,
              rois_per_step, overflow_bucket, interpret, compacted=False,
              v2=False):
    @jax.custom_jvp
    def f(feats, rois):
        return _prv_impl(feats, rois, strides, output_size, sampling_ratio,
                         finest_scale, rois_per_step, overflow_bucket,
                         interpret, compacted, v2)

    @f.defjvp
    def _jvp(primals, tangents):
        # pos rides as f32 so the whole output tree takes zero tangents
        out = f(*primals)
        return out, jax.tree.map(jnp.zeros_like, out)

    return f


def _prv_geom(dims, rois, strides, output_size, finest_scale, nr):
    """Per-RoI routing/geometry shared by the slab kernel's forward and
    backward: level routing, pass classing, per-view bucket compaction and
    the scalar-prefetch argument list.  `dims` is the static tuple of
    (H, W) per FPN level; rois [V, P, 4] image pixels."""
    L = len(dims)
    V, P = rois.shape[:2]
    O = output_size
    npass = len(PASS_SIZES)
    flat = rois.reshape(V * P, 4)

    area = jnp.clip((flat[:, 2] - flat[:, 0]) * (flat[:, 3] - flat[:, 1]),
                    0.0, None)
    lvl = jnp.clip(jnp.floor(jnp.log2(jnp.sqrt(area) / finest_scale + 1e-6)),
                   0, L - 1).astype(jnp.int32)
    sc_all = jnp.asarray([1.0 / s for s in strides], dtype=flat.dtype)
    sc = sc_all[lvl]
    cols_c = (flat[:, 2] - flat[:, 0]) * sc
    rows_c = (flat[:, 3] - flat[:, 1]) * sc
    cells = jnp.maximum(cols_c, rows_c)
    pass_id = jnp.zeros((V * P,), jnp.int32)
    for ph in PASS_SIZES:
        pass_id = pass_id + (cells > ph - 3)

    # ---- slab layout (levels along H; no tail pad: a patch that would
    # overrun the slab slides its origin UP into earlier levels' rows -
    # the hat weights for cells outside the routed level are exactly zero,
    # so the extra rows never contribute)
    Wmax = -(-max(w for _, w in dims) // 8) * 8
    row_offs, off = [], 0
    Hs_c, Ws_c = [], []
    for Hl, Wl in dims:
        row_offs.append(off)
        off += Hl
        Hs_c.append(Hl)
        Ws_c.append(Wl)
    # band-pass shapes (round 5): extreme-aspect rois that escape every
    # square pass are REAL traffic (barriers project wide, close
    # pedestrians tall - the honest-fixture trace put ~28 ms/step in the
    # XLA overflow branches), so the kernel serves them with two band
    # passes over the already-VMEM-resident slab:
    #   WIDE  [WIDE_PH, Wmax]  - full level width,  rois with rows <= 13
    #   TALL  [ph_tall, tall_pw] - full level height, rois with cols <= 13
    # Level routing caps sqrt(area) at 28 cells, so an overflow roi's
    # short side is < 784/61 < 13 cells - the bands cover ALL of them;
    # only degenerate fat rois (possible on tiny test maps) still take
    # the XLA overflow path (pass id npass + 2).
    ph_tall = -(-max(Hs_c) // 8) * 8
    tall_pw = min(TALL_PW, Wmax)
    # short slabs (e.g. the single p4 level, 32 rows) are zero-padded so
    # the largest patch pass always fits; the pad rows carry zero hat
    # weights and never contribute
    Hslab = max(off, PASS_SIZES[-1], ph_tall)

    if os.environ.get('MV2D_ALIGN_BANDS', '0') == '1':
        # REJECTED as default (round 5, measured): serving band rois
        # in-kernel TRIPLED the slab custom-call cost (detect align 17.6
        # -> 65.6 ms, train fwd 9 -> 46.6 in the honest-fixture trace;
        # step 300.2 -> 373.5 ms) - the [16, Wmax] / [ph_tall, 24] patch
        # dots need a [pw, O*C] transpose per chunk that Mosaic lowers as
        # huge vector-shuffle relayouts, dwarfing the ~28 ms XLA overflow
        # branches they replace.  Kept opt-in for revival with an
        # x-major slab layout.
        fits_wide = rows_c <= WIDE_PH - 3
        fits_tall = cols_c <= tall_pw - 11      # 8-aligned origin slack
    else:
        fits_wide = fits_tall = jnp.zeros_like(rows_c, bool)
    pass_id = jnp.where(
        pass_id < npass, pass_id,
        jnp.where(fits_wide, npass,
                  jnp.where(fits_tall, npass + 1, npass + 2)))
    nkp = npass + 2                             # kernel passes incl bands

    # ---- per-view bucket compaction: pass-p rois of view v land in a
    # contiguous nr-aligned run, so each grid step is single-pass.
    # Stable within-pass ranks come from per-pass CUMSUMS (an
    # argsort(argsort(.)) rank is two [V, P] sorts - measurably slower)
    pid_v = pass_id.reshape(V, P)
    counts = jnp.stack([(pid_v == p).sum(1) for p in range(nkp + 1)],
                       axis=1)                             # [V, nkp+1]
    run_off = jnp.concatenate(
        [jnp.zeros((V, 1), counts.dtype),
         jnp.cumsum(-(-counts // nr) * nr, axis=1)[:, :-1]], axis=1)
    within = jnp.zeros((V, P), jnp.int32)
    for p in range(nkp + 1):
        hit = pid_v == p
        within = jnp.where(hit, jnp.cumsum(hit, axis=1) - 1, within)
    pos = jnp.take_along_axis(run_off, pid_v, 1) + within  # [V, P]
    Pp = -(-(P + nkp * nr) // nr) * nr                     # padded slots
    spv = Pp // nr

    # ---- per-roi geometry at the routed level (pass-dependent clipping)
    row_off_t = jnp.asarray(row_offs)[lvl]
    H_t = jnp.asarray(Hs_c)[lvl]
    W_t = jnp.asarray(Ws_c)[lvl]
    x1 = flat[:, 0] * sc - 0.5
    y1 = flat[:, 1] * sc - 0.5
    bw = (flat[:, 2] - flat[:, 0]) * sc / O
    bh = (flat[:, 3] - flat[:, 1]) * sc / O
    ph_of = jnp.asarray(list(PASS_SIZES)
                        + [WIDE_PH, ph_tall, PASS_SIZES[-1]])[pass_id]
    pw_of = jnp.asarray([ph + 8 for ph in PASS_SIZES]
                        + [Wmax, tall_pw, PASS_SIZES[-1] + 8])[pass_id]
    # level-relative patch origin; may go negative (slide into earlier
    # levels) so the read [row, row+ph) always stays inside the slab
    py = jnp.clip(jnp.floor(y1).astype(jnp.int32),
                  jnp.minimum(-row_off_t, 0), Hslab - row_off_t - ph_of)
    px = jnp.floor(x1).astype(jnp.int32) // 8 * 8
    # the WIDE band's pw == Wmax forces px to 0 through this same clip
    px = jnp.clip(px, 0, jnp.maximum(Wmax - pw_of, 0))
    row = row_off_t + py

    # ---- route per-roi scalars into padded slots with ONE one-hot batched
    # matmul: 12 separate [V, P]-scatter ops are descriptor-bound on TPU
    # (~3 ms EACH standalone; the scatter wrapper, not the kernel, was the
    # slab align's unexplained ~2 us/roi floor)
    vals = jnp.stack(
        [row.astype(jnp.float32), px.astype(jnp.float32),
         (pass_id < nkp).astype(jnp.float32),
         y1.astype(jnp.float32), x1.astype(jnp.float32),
         bh.astype(jnp.float32), bw.astype(jnp.float32),
         H_t.astype(jnp.float32), W_t.astype(jnp.float32),
         py.astype(jnp.float32), pid_v.reshape(-1).astype(jnp.float32)],
        axis=-1).reshape(V, P, 11)
    onehot = (pos[:, None, :] ==
              jnp.arange(Pp)[None, :, None]).astype(jnp.float32)
    # HIGHEST precision: each slot has exactly ONE contributing roi, and a
    # single 1.0*v term reconstructs v exactly under bf16x3 - the default
    # bf16 pass would corrupt the sampling geometry scalars
    scat_all = jnp.einsum('vsp,vpk->vsk', onehot, vals,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)  # [V, Pp, 11]
    slot_has = onehot.sum(-1) > 0.5                            # [V, Pp]

    def col(k, as_int=False):
        x = scat_all[..., k].reshape(-1)
        return jnp.round(x).astype(jnp.int32) if as_int else x

    args = [col(0, True), col(1, True), col(2, True),
            col(3), col(4), col(5), col(6), col(7), col(8), col(9, True)]
    spass = jnp.where(slot_has, jnp.round(scat_all[..., 10]).astype(
        jnp.int32), nkp + 1)
    step_pass = spass.reshape(V, spv, nr).min(axis=2).reshape(-1)
    return dict(lvl=lvl, pass_id=pass_id, pos=pos, Pp=Pp, spv=spv,
                Wmax=Wmax, Hslab=Hslab, row_offs=row_offs,
                Hs_c=Hs_c, Ws_c=Ws_c, args=args, step_pass=step_pass,
                scat_all=scat_all, ph_tall=ph_tall, tall_pw=tall_pw,
                nkp=nkp)


def _prv_impl(feats, rois, strides, output_size, sampling_ratio,
              finest_scale, rois_per_step, overflow_bucket, interpret,
              compacted=False, v2=False):
    V, _, _, C = feats[0].shape
    P = rois.shape[1]
    nr = rois_per_step
    O, S = output_size, sampling_ratio
    npass = len(PASS_SIZES)
    flat = rois.reshape(V * P, 4)

    dims = tuple((f.shape[1], f.shape[2]) for f in feats)
    g = _prv_geom(dims, rois, strides, output_size, finest_scale, nr)
    lvl, pass_id, pos = g['lvl'], g['pass_id'], g['pos']
    Pp, spv, Wmax = g['Pp'], g['spv'], g['Wmax']
    row_offs, Hs_c, Ws_c = g['row_offs'], g['Hs_c'], g['Ws_c']
    args, step_pass = g['args'], g['step_pass']

    Hslab = g['Hslab']

    def make_stacked():
        # full [V, Hslab, Wmax, C] slab - only the v2 kernel and the
        # (gated) overflow branch need it materialized in HBM; the default
        # kernel assembles its VMEM slab from the per-level tensors
        parts = [jnp.pad(f, ((0, 0), (0, 0), (0, Wmax - f.shape[2]),
                             (0, 0)))
                 for f in feats]
        stk = jnp.concatenate(parts, axis=1)
        if stk.shape[1] < Hslab:
            stk = jnp.pad(stk, ((0, 0), (0, Hslab - stk.shape[1]),
                                (0, 0), (0, 0)))
        return stk

    if v2:
        stacked = make_stacked()
        scat_r = g['scat_all'].reshape(V * spv, nr, 11)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=11,
            grid=(V, spv),
            in_specs=[pl.BlockSpec((1, nr, 11),
                                   lambda v, i, *_: (v * spv + i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, nr, O, O, C),
                                   lambda v, i, *_: (v, i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((Hslab, Wmax, C), stacked.dtype),
                            pltpu.SemaphoreType.DMA],
        )
        out_s = pl.pallas_call(
            functools.partial(_kernel_slab_v2, nr=nr, spv=spv,
                              shapes=_pass_shapes(g, O, S), O=O, S=S),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((V, Pp, O, O, C), stacked.dtype),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(step_pass, *args, scat_r, stacked)
    else:
        # per-level inputs, W padded to sublane multiples; the kernel
        # DMA-assembles the VMEM slab (no HBM slab materialization)
        fpad, lvl_geo = [], []
        for f, ro in zip(feats, row_offs):
            w8 = -(-f.shape[2] // 8) * 8
            fpad.append(jnp.pad(f, ((0, 0), (0, 0), (0, w8 - f.shape[2]),
                                    (0, 0)))
                        if w8 > f.shape[2] else f)
            lvl_geo.append((ro, f.shape[1], w8))
        use_v3 = os.environ.get('MV2D_ALIGN_V3', '1') == '1'
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * len(feats)
        inputs = list(fpad)
        if use_v3:
            kern = functools.partial(_kernel_slab_v3, nr=nr, spv=spv,
                                     shapes=_pass_shapes(g, O, S), O=O, S=S,
                                     lvl_geo=tuple(lvl_geo))
            in_specs = [pl.BlockSpec((1, nr, 11),
                                     lambda v, i, *_: (v * spv + i, 0, 0),
                                     memory_space=pltpu.VMEM)] + in_specs
            inputs = [g['scat_all'].reshape(V * spv, nr, 11)] + inputs
        else:
            kern = functools.partial(_kernel_slab, nr=nr, spv=spv,
                                     shapes=_pass_shapes(g, O, S), O=O, S=S,
                                     lvl_geo=tuple(lvl_geo))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=11,
            grid=(V, spv),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, nr, O, O, C),
                                   lambda v, i, *_: (v, i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((Hslab, Wmax, C), feats[0].dtype),
                            pltpu.SemaphoreType.DMA((len(feats),))],
        )
        out_s = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((V, Pp, O, O, C),
                                           feats[0].dtype),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=('arbitrary', 'arbitrary')),
        )(step_pass, *args, *inputs)
    out_s = out_s.reshape(V, Pp, O, O, C)
    if not compacted:
        out = jnp.take_along_axis(out_s, pos[:, :, None, None, None], 1)

    if overflow_bucket > 0:
        R = V * P
        K = min(overflow_bucket, R)
        over_all = pass_id == g['nkp']
        # bucket the (rare, extreme-aspect) overflow rois BY ORIENTATION:
        # each bucket gathers only its own band shape (wide = 16 full slab
        # rows, tall = a 24-col granule band) - the dual-path form read ~2x
        # the bytes per slot and where-selected.  Each orientation gets its
        # own count-keyed lax.switch (no-op / 32-slot / full bucket), so
        # the common no-overflow frame pays nothing and a typical real
        # frame pays a few 32-slot gathers.  Compaction is a cumsum-scatter
        # (an R-element argsort cost ~1 ms at R=12k); the stacked slab is
        # built INSIDE the taken branch only.
        # orientation in image pixels == orientation in cells (same scale
        # multiplies both sides), matching _overflow_align_stacked's test
        wide_all = ((flat[:, 2] - flat[:, 0])
                    >= (flat[:, 3] - flat[:, 1]))

        def apply_mode(buf, mode):
            over = over_all & (wide_all if mode == 'wide' else ~wide_all)
            n_over = over.sum()

            def make_branch(k):
                def add_overflow(buf):
                    sel, _ = _compact_idx(over, k)
                    valid = jnp.arange(k) < n_over
                    vi = (sel // P).astype(jnp.int32)
                    o_small = _overflow_align_stacked(
                        make_stacked(), row_offs, Hs_c, Ws_c, strides,
                        flat[sel], lvl[sel], vi, O, S, mode=mode)
                    o_small = o_small * valid[:, None, None, None]
                    if compacted:
                        # scatter into each overflow roi's compacted slot
                        sl = vi * Pp + pos.reshape(-1)[sel]
                        return buf.reshape(V * Pp, O, O, C).at[sl].add(
                            o_small.astype(buf.dtype)).reshape(V, Pp, O,
                                                               O, C)
                    return buf.reshape(R, O, O, C).at[sel].add(
                        o_small.astype(buf.dtype)).reshape(V, P, O, O, C)
                return add_overflow

            K1 = min(32, K)
            branches = [lambda b: b, make_branch(K1)]
            if K > K1:
                branches.append(make_branch(K))
            idx = jnp.minimum((n_over > 0).astype(jnp.int32)
                              + (n_over > K1).astype(jnp.int32),
                              len(branches) - 1)
            return jax.lax.switch(idx, branches, buf)

        if compacted:
            out_s = apply_mode(apply_mode(out_s, 'wide'), 'tall')
        else:
            out = apply_mode(apply_mode(out, 'wide'), 'tall')
    if compacted:
        return out_s, pos.astype(jnp.float32)
    return out


# --------------------------------------------------------------------------
# Differentiable slab align (the R-CNN TRAINING stage).
#
# The XLA gather align's backward is a row scatter-add ([R, 196, 4C] sample
# grads into the parity buffer) - descriptor-bound, ~7.7% of the train-step
# device profile.  Here the backward is slab-RESIDENT like the forward:
# dPatch = By^T dOut Bx per RoI (two small batched MXU dots - the exact
# transpose of the forward's separable evaluation) accumulated at dynamic
# offsets into a VMEM-resident f32 dSlab block that is flushed to HBM once
# per (channel-split, view), then unstacked into per-level grads.  No
# scatter anywhere; RoI (box) gradients are zero by design (the reference
# detaches sampled proposals before RoIAlign, mv2d.py:110-113).
# --------------------------------------------------------------------------


def _kernel_slab_bwd(step_pass_ref, row_ref, px_ref, active_ref, y1_ref,
                     x1_ref, bh_ref, bw_ref, hf_ref, wf_ref, py_ref,
                     dout_ref, dslab_ref, *, nr: int, spv: int, shapes,
                     O: int, S: int):
    """Grid (csplit, V, spv); dslab_ref [1, Hslab, Wmax, Cb] f32 keeps a
    constant block index over the roi-step axis, so windows accumulate in
    VMEM and the block is written back once per (channel split, view)."""
    v = pl.program_id(1)
    i = pl.program_id(2)
    base = (v * spv + i) * nr

    @pl.when(i == 0)
    def _():
        dslab_ref[:] = jnp.zeros_like(dslab_ref)

    sp = step_pass_ref[v * spv + i]
    qio = jax.lax.broadcasted_iota(jnp.int32, (O, 1), 0).astype(jnp.float32)

    for p, (ph, pw, smax) in enumerate(shapes):

        @pl.when(sp == p)
        def _(ph=ph, pw=pw, smax=smax):
            cell_y = jax.lax.broadcasted_iota(jnp.int32, (O, ph),
                                              1).astype(jnp.float32)
            cell_x = jax.lax.broadcasted_iota(jnp.int32, (O, pw),
                                              1).astype(jnp.float32)
            # EXACT mirror of _kernel_slab's weight build (sample-mean and
            # active-mask folds included) - the backward must transpose the
            # same linear map the forward evaluated
            bys, bxs = [], []
            for j in range(nr):
                act = (active_ref[base + j] > 0).astype(jnp.float32)
                by, bx = _hat_axes(
                    y1_ref[base + j], x1_ref[base + j], bh_ref[base + j],
                    bw_ref[base + j], hf_ref[base + j], wf_ref[base + j],
                    py_ref[base + j].astype(jnp.float32),
                    px_ref[base + j].astype(jnp.float32),
                    qio, cell_y, cell_x, S, act=act, smax=smax)
                bys.append(by)
                bxs.append(bx)

            # chunk the batched dots on the fat band passes (bounds the
            # [nrc, pw, ph*Cb] f32 transients)
            nrc = max(min(nr, (16 * 24 * nr) // (ph * pw)), 1)
            while nr % nrc:
                nrc -= 1
            for cb in range(nr // nrc):
                cbase = base + cb * nrc
                By = jnp.stack(bys[cb * nrc:(cb + 1) * nrc])  # [nrc, O, ph]
                Bx = jnp.stack(bxs[cb * nrc:(cb + 1) * nrc])  # [nrc, O, pw]
                dout = dout_ref[0, pl.ds(cb * nrc, nrc)].astype(
                    jnp.float32)                      # [nrc, O, O, Cb]
                Cb = dout.shape[-1]
                # u[n, y, ox*c] = sum_oy By[n, oy, y] dOut[n, oy, ox, c]
                u = jax.lax.dot_general(
                    By, dout.reshape(nrc, O, O * Cb),
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [nrc, ph, O*Cb]
                u = u.reshape(nrc, ph, O, Cb).transpose(0, 2, 1, 3)
                u = u.reshape(nrc, O, ph * Cb)
                # w[n, x, y*c] = sum_ox Bx[n, ox, x] u[n, ox, y*c]
                w = jax.lax.dot_general(
                    Bx, u, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [nrc, pw, ph*Cb]
                w = w.reshape(nrc, pw, ph, Cb).transpose(0, 2, 1, 3)

                for j in range(nrc):
                    @pl.when(active_ref[cbase + j] > 0)
                    def _(j=j):
                        dslab_ref[0,
                                  pl.ds(row_ref[cbase + j], ph),
                                  pl.ds(pl.multiple_of(px_ref[cbase + j],
                                                       8), pw),
                                  :] += w[j]


def _kernel_slab_bwd_v2(step_pass_ref, row_ref, px_ref, active_ref, y1_ref,
                        x1_ref, bh_ref, bw_ref, hf_ref, wf_ref, py_ref,
                        scat_ref, dout_ref, dslab_ref, *, nr: int, spv: int,
                        shapes, O: int, S: int):
    """Batched-hat version of _kernel_slab_bwd (see _kernel_slab_v2)."""
    v = pl.program_id(1)
    i = pl.program_id(2)
    base = (v * spv + i) * nr

    @pl.when(i == 0)
    def _():
        dslab_ref[:] = jnp.zeros_like(dslab_ref)

    sp = step_pass_ref[v * spv + i]

    for p, (ph, pw, smax) in enumerate(shapes):
        nrc = max(min(nr, (16 * 24 * nr) // (ph * pw)), 1)
        while nr % nrc:
            nrc -= 1

        @pl.when(sp == p)
        def _(ph=ph, pw=pw, smax=smax, nrc=nrc):
            qio = jax.lax.broadcasted_iota(
                jnp.int32, (1, O, 1), 1).astype(jnp.float32)
            cell_y = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, ph), 2).astype(jnp.float32)
            cell_x = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, pw), 2).astype(jnp.float32)
            for chunk in range(nr // nrc):
                cbase = base + chunk * nrc
                svb = scat_ref[0, pl.ds(chunk * nrc, nrc), :]

                def col(k):
                    return svb[:, k][:, None, None]
                act = (col(2) > 0).astype(jnp.float32)
                # act + divisors fold into the per-sample masks (Mosaic
                # broadcast constraint, see _kernel_slab_v2)
                By, Bx = _hat_axes(col(3), col(4), col(5), col(6),
                                   col(7), col(8), col(9), col(1),
                                   qio, cell_y, cell_x, S, act=act,
                                   smax=smax)

                dout = dout_ref[0, pl.ds(chunk * nrc, nrc)].astype(
                    jnp.float32)                      # [nrc, O, O, Cb]
                Cb = dout.shape[-1]
                u = jax.lax.dot_general(
                    By, dout.reshape(nrc, O, O * Cb),
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [nrc, ph, O*Cb]
                u = u.reshape(nrc, ph, O, Cb).transpose(0, 2, 1, 3)
                u = u.reshape(nrc, O, ph * Cb)
                w = jax.lax.dot_general(
                    Bx, u, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [nrc, pw, ph*Cb]
                w = w.reshape(nrc, pw, ph, Cb).transpose(0, 2, 1, 3)

                for j in range(nrc):
                    @pl.when(active_ref[cbase + j] > 0)
                    def _(j=j):
                        dslab_ref[0,
                                  pl.ds(row_ref[cbase + j], ph),
                                  pl.ds(pl.multiple_of(px_ref[cbase + j],
                                                       8), pw),
                                  :] += w[j]


def _prv_bwd_impl(dout_s, rois, dims, strides, output_size, sampling_ratio,
                  finest_scale, nr, interpret, v2=False):
    """dout_s [V, Pp, O, O, C] (compacted slot order) -> per-level
    dFeat [V, H_l, W_l, C] f32 list."""
    V, Pp, O, _, C = dout_s.shape
    g = _prv_geom(dims, rois, strides, output_size, finest_scale, nr)
    Hslab, Wmax, spv = g['Hslab'], g['Wmax'], g['spv']
    # channel split keeps the VMEM-resident f32 slab block under ~56 MB
    Cb = C
    while Hslab * Wmax * Cb * 4 > 56 * 1024 * 1024 and Cb % 256 == 0:
        Cb //= 2
    csplit = C // Cb

    in_specs = [pl.BlockSpec((1, nr, O, O, Cb),
                             lambda c, v, i, *_: (v, i, 0, 0, c))]
    inputs = [dout_s]
    kern = _kernel_slab_bwd
    if v2:
        in_specs = [pl.BlockSpec((1, nr, 11),
                                 lambda c, v, i, *_: (v * spv + i, 0, 0),
                                 memory_space=pltpu.VMEM)] + in_specs
        inputs = [g['scat_all'].reshape(V * spv, nr, 11)] + inputs
        kern = _kernel_slab_bwd_v2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
        grid=(csplit, V, spv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hslab, Wmax, Cb),
                               lambda c, v, i, *_: (v, 0, 0, c),
                               memory_space=pltpu.VMEM),
    )
    dstacked = pl.pallas_call(
        functools.partial(kern, nr=nr, spv=spv,
                          shapes=_pass_shapes(g, O, sampling_ratio),
                          O=O, S=sampling_ratio),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, Hslab, Wmax, C), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=('arbitrary', 'arbitrary', 'arbitrary')),
    )(g['step_pass'], *g['args'], *inputs)
    return [dstacked[:, ro:ro + Hl, :Wl, :]
            for (Hl, Wl), ro in zip(dims, g['row_offs'])]


@functools.lru_cache(maxsize=None)
def _make_prv_train(strides, output_size, sampling_ratio, finest_scale,
                    rois_per_step, interpret, dims, dtypes, v2=False):
    @jax.custom_vjp
    def f(feats, rois):
        return _prv_impl(feats, rois, strides, output_size, sampling_ratio,
                         finest_scale, rois_per_step, 0, interpret,
                         compacted=True, v2=v2)

    def fwd(feats, rois):
        return f(feats, rois), rois

    def bwd(rois, g):
        dout_s, _ = g                                 # pos takes no grad
        dfeats = _prv_bwd_impl(dout_s, rois, dims, strides, output_size,
                               sampling_ratio, finest_scale, rois_per_step,
                               interpret, v2=v2)
        return (tuple(df.astype(dt) for df, dt in zip(dfeats, dtypes)),
                jnp.zeros_like(rois))

    f.defvjp(fwd, bwd)
    return f


def pallas_roi_align_views_train(feats: Sequence[jnp.ndarray],
                                 rois: jnp.ndarray,
                                 strides: Sequence[int],
                                 output_size: int = 7,
                                 sampling_ratio: int = 2,
                                 finest_scale: float = 56.0,
                                 rois_per_step: int = 8,
                                 overflow_bucket: int = 128,
                                 interpret: bool | None = None,
                                 v2: bool | None = None):
    """DIFFERENTIABLE slab RoIAlign for view-uniform training RoIs.

    feats: per-level [V, H, W, C]; rois [V, P, 4] image pixels.  Returns
    (out_s [V, Pp, O, O, C] in compacted slot order, pos [V, P] int32):
    run the per-RoI head on out_s and un-permute its small outputs with
    `pos` instead of un-permuting the big align tensor.  Gradients flow to
    `feats` only (sampled proposals are detached in the reference,
    mv2d.py:110-113).  Extreme-aspect overflow RoIs take the XLA gather
    align whose autodiff covers their grads (bounded scatter, <= K rois).
    """
    import jax as _jax
    if interpret is None:
        interpret = _jax.default_backend() != 'tpu'
    ob_env = os.environ.get('MV2D_ALIGN_OVERFLOW_K')
    if ob_env is not None:
        overflow_bucket = min(overflow_bucket, int(ob_env))
    V, P = rois.shape[:2]
    O = output_size
    if not interpret and feats[0].shape[-1] % 128 != 0:
        from .roi_align import multilevel_roi_align
        vi = jnp.repeat(jnp.arange(V), P)
        out = multilevel_roi_align(feats, rois.reshape(V * P, 4), vi,
                                   strides, output_size, sampling_ratio,
                                   finest_scale)
        return (out.reshape(V, P, *out.shape[1:]),
                jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (V, P)))
    dims = tuple((f.shape[1], f.shape[2]) for f in feats)
    dtypes = tuple(f.dtype for f in feats)
    if v2 is None:
        v2 = os.environ.get('MV2D_ALIGN_V2', '0') == '1'
    fn = _make_prv_train(tuple(strides), output_size, sampling_ratio,
                         finest_scale, rois_per_step, interpret, dims,
                         dtypes, v2)
    out_s, posf = fn(tuple(feats), rois)
    pos = jax.lax.stop_gradient(posf).astype(jnp.int32)
    C = out_s.shape[-1]
    Pp = out_s.shape[1]

    if overflow_bucket > 0:
        # differentiable band-dense align for the (rare) overflow rois
        # (same exact-unclamped form as the eval kernel's overflow path;
        # fwd = few fat-row gathers + two einsums, bwd = their transposes -
        # the previous per-sample lattice cost ~9 ms of descriptor-bound
        # corner gathers fwd and a matching scatter-add bwd).  Gated on
        # over.any(): a step with no overflow rois (the common case) skips
        # the stacked-slab assembly, gathers and einsums entirely - fwd AND
        # bwd (cond's VJP differentiates only the taken branch)
        g = _prv_geom(dims, rois, tuple(strides), output_size, finest_scale,
                      rois_per_step)
        over_all = g['pass_id'] == g['nkp']
        R = V * P
        K = min(overflow_bucket, R)
        flat_r = rois.reshape(-1, 4)
        wide_all = (flat_r[:, 2] - flat_r[:, 0]) >= (flat_r[:, 3]
                                                     - flat_r[:, 1])

        # per-ORIENTATION tiered no-op / small / full buckets keyed on the
        # actual overflow count + cumsum-scatter compaction, as the eval
        # path above (each bucket gathers only its own band shape); the
        # switch's VJP differentiates only the taken branch, so an
        # overflow-free step skips the slab assembly fwd AND bwd
        def apply_mode(buf, mode):
            over = over_all & (wide_all if mode == 'wide' else ~wide_all)
            n_over = over.sum()

            def make_branch(k):
                def add_overflow(buf):
                    sel, _ = _compact_idx(over, k)
                    valid = jnp.arange(k) < n_over
                    vi = (sel // P).astype(jnp.int32)
                    parts = [jnp.pad(f, ((0, 0), (0, 0),
                                         (0, g['Wmax'] - f.shape[2]),
                                         (0, 0)))
                             for f in feats]
                    stk = jnp.concatenate(parts, axis=1)
                    if stk.shape[1] < g['Hslab']:
                        stk = jnp.pad(stk, ((0, 0),
                                            (0, g['Hslab'] - stk.shape[1]),
                                            (0, 0), (0, 0)))
                    o = _overflow_align_stacked(stk, g['row_offs'],
                                                g['Hs_c'],
                                                g['Ws_c'], strides,
                                                flat_r[sel],
                                                g['lvl'][sel], vi, O,
                                                sampling_ratio, mode=mode)
                    o = o * valid[:, None, None, None]
                    sl = vi * Pp + g['pos'].reshape(-1)[sel]
                    return buf.reshape(V * Pp, O, O, C).at[sl].add(
                        o.astype(buf.dtype)).reshape(V, Pp, O, O, C)
                return add_overflow

            K1 = min(32, K)
            branches = [lambda b: b, make_branch(K1)]
            if K > K1:
                branches.append(make_branch(K))
            idx = jnp.minimum((n_over > 0).astype(jnp.int32)
                              + (n_over > K1).astype(jnp.int32),
                              len(branches) - 1)
            return jax.lax.switch(idx, branches, buf)

        out_s = apply_mode(apply_mode(out_s, 'wide'), 'tall')
    return out_s, pos
