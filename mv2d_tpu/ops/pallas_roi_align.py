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
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(row_ref, px_ref, view_ref, active_ref, y1_ref, x1_ref,
            bh_ref, bw_ref, hf_ref, wf_ref, py_ref,
            feat_ref, out_ref, patch_scratch, sems, *,
            nr: int, ph: int, pw: int, O: int, S: int):
    """One grid step processes `nr` rois.

    scalar prefetch (all [R]): row (stacked-buffer row origin), px (8-aligned
    col origin), view, active (int32); y1/x1/bh/bw (sample geometry, cells),
    hf/wf (the routed level's true H/W for border tests), py (patch row
    origin within the level) as f32/int32 1D arrays (2D scalar operands pad
    their minor dim to 128 lanes and blow the 1 MB SMEM budget).
    """
    step = pl.program_id(0)
    base = step * nr

    def dma(j):
        # px is constructed 8-aligned on the host (Mosaic tiling constraint
        # on the second-minor dim); multiple_of carries the proof
        return pltpu.make_async_copy(
            feat_ref.at[view_ref[base + j],
                        pl.ds(row_ref[base + j], ph),
                        pl.ds(pl.multiple_of(px_ref[base + j], 8), pw), :],
            patch_scratch.at[j],
            sems.at[j])

    for j in range(nr):
        @pl.when(active_ref[base + j] > 0)
        def _():
            dma(j).start()

    n_samp = O * S
    # sample centers in bin units: (q + 0.5)/S == bin(q//S) + (q%S + 0.5)/S
    samp = (jax.lax.broadcasted_iota(jnp.int32, (n_samp, 1), 0)
            .astype(jnp.float32) + 0.5) / S               # [n_samp, 1]
    cell_y = jax.lax.broadcasted_iota(jnp.int32, (n_samp, ph),
                                      1).astype(jnp.float32)
    cell_x = jax.lax.broadcasted_iota(jnp.int32, (n_samp, pw),
                                      1).astype(jnp.float32)

    # per-roi weight blocks built in 2D (scalar broadcasts), then stacked -
    # Mosaic supports 2D scalar math + stacking, not 1D->3D reshapes
    ays, axs = [], []
    for j in range(nr):
        y1 = y1_ref[base + j]
        x1 = x1_ref[base + j]
        bh = bh_ref[base + j]
        bw = bw_ref[base + j]
        H = hf_ref[base + j]
        W = wf_ref[base + j]
        oy = py_ref[base + j].astype(jnp.float32)
        ox = px_ref[base + j].astype(jnp.float32)
        ys = y1 + samp * bh                               # [n_samp, 1]
        xs = x1 + samp * bw
        in_y = (ys > -1.0) & (ys < H)
        in_x = (xs > -1.0) & (xs < W)
        ys = jnp.clip(ys, 0.0, H - 1) - oy
        xs = jnp.clip(xs, 0.0, W - 1) - ox
        ays.append(jnp.maximum(1.0 - jnp.abs(ys - cell_y), 0.0) * in_y)
        axs.append(jnp.maximum(1.0 - jnp.abs(xs - cell_x), 0.0) * in_x)
    ay = jnp.stack(ays)                                   # [nr, n_samp, ph]
    ax = jnp.stack(axs)                                   # [nr, n_samp, pw]

    for j in range(nr):
        @pl.when(active_ref[base + j] > 0)
        def _():
            dma(j).wait()

        # inactive slots hold uninitialized VMEM (NaN bit patterns would
        # poison the batched dot even under zero weights) - zero them
        @pl.when(active_ref[base + j] == 0)
        def _():
            patch_scratch[j] = jnp.zeros_like(patch_scratch[j])

    # one batched pair of dots over all nr rois (tiny per-roi matmuls are
    # dispatch-bound; batching amortizes the MXU setup)
    patches = patch_scratch[:]                            # [nr, ph, pw, C]
    C = patches.shape[-1]
    tmp = jax.lax.dot_general(
        ay.astype(patches.dtype), patches.reshape(nr, ph, pw * C),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [nr, n_samp, pw*C]
    tmp = tmp.reshape(nr, n_samp, pw, C).astype(patches.dtype)
    tmp = tmp.transpose(0, 2, 1, 3).reshape(nr, pw, n_samp * C)
    full = jax.lax.dot_general(
        ax.astype(patches.dtype), tmp,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [nr, q, p*C]
    full = full.reshape(nr, n_samp, n_samp, C).transpose(0, 2, 1, 3)
    full = full.reshape(nr, O, S, O, S, C)
    out = full.mean(axis=(2, 4))                          # [nr, O, O, C]
    # inactive slots already yield exact zeros: their patch was zeroed above
    # and the hat weights are finite, so no explicit mask is needed (a 1D
    # active vector can't broadcast to 4D under Mosaic anyway)
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
        scratch_shapes=[pltpu.VMEM((nr, ph, pw, C), stacked.dtype),
                        pltpu.SemaphoreType.DMA((nr,))],
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


def _pma_impl(feats, rois, view_idx, strides, output_size, sampling_ratio,
              finest_scale, rois_per_step, patch, overflow_bucket,
              interpret):
    from .roi_align import multilevel_roi_align
    L = len(feats)
    V, _, _, C = feats[0].shape
    area = jnp.clip((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]),
                    0.0, None)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(area) / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, L - 1).astype(jnp.int32)

    # ---- stacked buffer: levels along H, padded to a common (8-aligned) W
    Wmax = -(-max(f.shape[2] for f in feats) // 8) * 8
    parts, row_offs, off = [], [], 0
    Hs_c, Ws_c, Ss_c = [], [], []
    for f, s in zip(feats, strides):
        Hl, Wl = f.shape[1], f.shape[2]
        parts.append(jnp.pad(f, ((0, 0), (0, 0), (0, Wmax - Wl), (0, 0))))
        row_offs.append(off)
        off += Hl
        Hs_c.append(Hl)
        Ws_c.append(Wl)
        Ss_c.append(1.0 / s)
    # tail pad so a patch starting at the last level stays in-bounds
    ph_max = min(patch, off)
    parts.append(jnp.zeros((V, ph_max, Wmax, C), feats[0].dtype))
    stacked = jnp.concatenate(parts, axis=1)
    row_off_t = jnp.asarray(row_offs)[lvl]
    H_t = jnp.asarray(Hs_c)[lvl]
    W_t = jnp.asarray(Ws_c)[lvl]
    sc = jnp.asarray(Ss_c, dtype=rois.dtype)[lvl]

    # ---- per-roi geometry at the routed level
    O = output_size
    x1 = rois[:, 0] * sc - 0.5
    y1 = rois[:, 1] * sc - 0.5
    bw = (rois[:, 2] - rois[:, 0]) * sc / O
    bh = (rois[:, 3] - rois[:, 1]) * sc / O
    w_cells = (rois[:, 2] - rois[:, 0]) * sc
    h_cells = (rois[:, 3] - rois[:, 1]) * sc

    def scalars_for(ph, pw):
        py = jnp.clip(jnp.floor(y1).astype(jnp.int32), 0,
                      jnp.maximum(H_t - ph, 0))
        px = jnp.floor(x1).astype(jnp.int32) // 8 * 8
        px = jnp.clip(px, 0, max(Wmax - pw, 0))
        return dict(row=(row_off_t + py).astype(jnp.int32),
                    px=px.astype(jnp.int32),
                    view=view_idx.astype(jnp.int32),
                    y1=y1.astype(jnp.float32), x1=x1.astype(jnp.float32),
                    bh=bh.astype(jnp.float32), bw=bw.astype(jnp.float32),
                    hf=H_t.astype(jnp.float32), wf=W_t.astype(jnp.float32),
                    py=py.astype(jnp.int32))

    small = patch // 2
    fits_small = (w_cells <= small - 3) & (h_cells <= small - 3)
    fits_big = (w_cells <= patch - 3) & (h_cells <= patch - 3)

    out = _stacked_align(stacked, scalars_for(min(small, off), small + 8),
                         fits_small, O, sampling_ratio, rois_per_step,
                         min(small, off), small + 8, interpret)
    out = out + _stacked_align(stacked, scalars_for(ph_max, patch + 8),
                               fits_big & ~fits_small, O, sampling_ratio,
                               rois_per_step, ph_max, patch + 8, interpret)

    if overflow_bucket > 0:
        R = rois.shape[0]
        K = min(overflow_bucket, R)
        over = ~fits_big
        sel = jnp.argsort(~over, stable=True)[:K]
        o_small = multilevel_roi_align(feats, rois[sel], view_idx[sel],
                                       strides, output_size, sampling_ratio,
                                       finest_scale)
        o_small = o_small * over[sel][:, None, None, None]
        out = out.at[sel].add(o_small.astype(out.dtype))
    return out
