"""RoIAlign as a Pallas patch-DMA kernel (separable bilinear on the MXU).

XLA gathers on TPU run at ~40 GB/s effective (descriptor-bound); the R-CNN
stage's 12k RoIs x 196 samples cost ~120 ms.  This kernel instead:

  * DMAs one contiguous [PH, PW, C] feature patch per RoI from HBM to VMEM
    (large sequential rows -> near-peak bandwidth),
  * evaluates bilinear interpolation SEPARABLY: sample weights factor into
    1D hat functions, so the 14x14 sample lattice is two small matmuls
      tmp = Ay [S, PH] @ patch [PH, PW*C]
      out[q, p, c] = Ax [S, PW] contracted with tmp [S, PW, C]
    that run on the MXU instead of 784 scattered loads,
  * averages the SxS sample grid into the 7x7 output bins.

Multi-level routing runs the kernel once per FPN level with per-RoI active
flags (inactive steps skip their DMA and compute); the four partial outputs
sum into the final result.  mmdet level-clamping guarantees any RoI spans
<= 29 cells at its routed level, so a 32-cell patch always covers it.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(py_ref, px_ref, view_ref, active_ref, y1_ref, x1_ref,
            bh_ref, bw_ref, feat_ref, out_ref, patch_scratch, sems, *,
            nr: int, ph: int, pw: int, O: int, S: int, H: int, W: int):
    """One grid step processes `nr` rois.

    scalar prefetch: py/px/view/active [R] int32; y1/x1/bh/bw [R] f32
    (sample geometry in cell coords; 1D arrays - 2D scalar operands pad
    their minor dim to 128 lanes and blow the 1 MB SMEM budget).
    feat_ref: [V, H, W, C] (ANY/HBM); out_ref block: [nr, O, O, C];
    patch_scratch: [nr, ph, pw, C] VMEM; sems: DMA semaphores [nr].
    """
    step = pl.program_id(0)
    base = step * nr

    def dma(j):
        # px is constructed 8-aligned on the host (Mosaic tiling constraint
        # on the second-minor dim); multiple_of carries the proof
        return pltpu.make_async_copy(
            feat_ref.at[view_ref[base + j],
                        pl.ds(py_ref[base + j], ph),
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
            .astype(jnp.float32) + 0.5) / S

    for j in range(nr):
        @pl.when(active_ref[base + j] > 0)
        def _():
            dma(j).wait()
            y1 = y1_ref[base + j]
            x1 = x1_ref[base + j]
            bh = bh_ref[base + j]
            bw = bw_ref[base + j]
            oy = py_ref[base + j]
            ox = px_ref[base + j]
            # absolute sample coords, then patch-relative
            ys = y1 + samp * bh                           # [n_samp, 1]
            xs = x1 + samp * bw
            in_y = (ys > -1.0) & (ys < H)
            in_x = (xs > -1.0) & (xs < W)
            ys = jnp.clip(ys, 0.0, H - 1) - oy.astype(jnp.float32)
            xs = jnp.clip(xs, 0.0, W - 1) - ox.astype(jnp.float32)
            cell_y = jax.lax.broadcasted_iota(jnp.int32, (n_samp, ph),
                                              1).astype(jnp.float32)
            cell_x = jax.lax.broadcasted_iota(jnp.int32, (n_samp, pw),
                                              1).astype(jnp.float32)
            ay = jnp.maximum(1.0 - jnp.abs(ys - cell_y), 0.0) * in_y
            ax = jnp.maximum(1.0 - jnp.abs(xs - cell_x), 0.0) * in_x
            # matmul in the feature dtype (bf16 on TPU) with f32 accumulation
            # - upcasting the whole patch on the VPU costs more than the dots
            patch = patch_scratch[j]                      # [ph, pw, C]
            C = patch.shape[-1]
            tmp = jax.lax.dot_general(
                ay.astype(patch.dtype), patch.reshape(ph, pw * C),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [n_samp, pw*C]
            tmp = tmp.reshape(n_samp, pw, C).astype(patch.dtype)
            # out[q, p, c] = sum_x ax[q, x] tmp[p, x, c]
            full = jax.lax.dot_general(
                ax.astype(patch.dtype), tmp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [q, p, C]
            full = full.transpose(1, 0, 2)                # [p(y), q(x), C]
            full = full.reshape(O, S, O, S, C)
            out = full.mean(axis=(1, 3))
            out_ref[j] = out.astype(out_ref.dtype)

    for j in range(nr):
        @pl.when(active_ref[base + j] == 0)
        def _():
            out_ref[j] = jnp.zeros_like(out_ref[j])


def _level_align(feat: jnp.ndarray, rois: jnp.ndarray, view: jnp.ndarray,
                 active: jnp.ndarray, stride: float, output_size: int,
                 sampling_ratio: int, nr: int, patch: int,
                 interpret: bool, full_patch: bool = False) -> jnp.ndarray:
    V, H, W, C = feat.shape
    R = rois.shape[0]
    O, S = output_size, sampling_ratio
    sc = 1.0 / stride
    x1 = rois[:, 0] * sc - 0.5
    y1 = rois[:, 1] * sc - 0.5
    bw = (rois[:, 2] - rois[:, 0]) * sc / O
    bh = (rois[:, 3] - rois[:, 1]) * sc / O
    # last (coarsest) level is the routing catch-all: RoIs there may span the
    # whole map, so the patch covers it fully; other levels are bounded at
    # <29 cells by mmdet's log2 routing.
    # Mosaic constraint: the DMA offset in the W (second-minor, tiled) dim
    # must be 8-aligned -> align px down to 8 and widen the patch by 8;
    # W itself is padded to a multiple of 8 (padded cells carry zero weight).
    Wp = -(-W // 8) * 8
    if Wp != W:
        feat = jnp.pad(feat, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    ph = H if full_patch else min(patch, H)
    pw = Wp if full_patch else min(patch + 8, Wp)
    py = jnp.clip(jnp.floor(y1).astype(jnp.int32), 0, max(H - ph, 0))
    px = jnp.floor(x1).astype(jnp.int32) // 8 * 8
    px = jnp.clip(px, 0, max(Wp - pw, 0))
    y1f = y1.astype(jnp.float32)
    x1f = x1.astype(jnp.float32)
    bhf = bh.astype(jnp.float32)
    bwf = bw.astype(jnp.float32)

    nb = -(-R // nr)
    pad = nb * nr - R
    if pad:
        py = jnp.pad(py, (0, pad))
        px = jnp.pad(px, (0, pad))
        view = jnp.pad(view, (0, pad))
        active = jnp.pad(active, (0, pad))
        y1f = jnp.pad(y1f, (0, pad))
        x1f = jnp.pad(x1f, (0, pad))
        bhf = jnp.pad(bhf, (0, pad))
        bwf = jnp.pad(bwf, (0, pad))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nr, O, O, C), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nr, ph, pw, C), feat.dtype),
                        pltpu.SemaphoreType.DMA((nr,))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nr=nr, ph=ph, pw=pw, O=O, S=S, H=H, W=W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * nr, O, O, C), feat.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(py, px, view.astype(jnp.int32), active.astype(jnp.int32),
      y1f, x1f, bhf, bwf, feat)
    return out[:R]


def pallas_multilevel_roi_align(feats: Sequence[jnp.ndarray],
                                rois: jnp.ndarray, view_idx: jnp.ndarray,
                                strides: Sequence[int],
                                output_size: int = 7,
                                sampling_ratio: int = 2,
                                finest_scale: float = 56.0,
                                rois_per_step: int = 8,
                                patch: int = 32,
                                overflow_bucket: int = 256,
                                interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in replacement for ops.roi_align.multilevel_roi_align
    (inference / no-grad paths only - tangents are ZERO; training uses the
    differentiable XLA gather align).

    mmdet routes by sqrt(area), so extreme-aspect RoIs can span more cells
    than the DMA patch on their long side; those (rare) RoIs are diverted to
    an `overflow_bucket`-sized XLA-gather fallback so results stay exact.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
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
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    from .roi_align import multilevel_roi_align
    L = len(feats)
    area = jnp.clip((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]),
                    0.0, None)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(area) / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, L - 1).astype(jnp.int32)

    # fit test at the routed level (last level uses the full map: always fits)
    strides_arr = jnp.asarray(strides, dtype=rois.dtype)[lvl]
    w_cells = (rois[:, 2] - rois[:, 0]) / strides_arr
    h_cells = (rois[:, 3] - rois[:, 1]) / strides_arr
    small_patch = patch // 2
    fits_small = (w_cells <= small_patch - 3) & (h_cells <= small_patch - 3)
    fits = ((w_cells <= patch - 3) & (h_cells <= patch - 3)) | (lvl == L - 1)

    out = None
    for i, f in enumerate(feats):
        last = i == L - 1
        on_lvl = lvl == i
        if last:
            o = _level_align(f, rois, view_idx, on_lvl & fits,
                             float(strides[i]), output_size, sampling_ratio,
                             rois_per_step, patch, interpret,
                             full_patch=True)
        else:
            # two passes: half-size patches for small RoIs (most real
            # detections) - 4x less DMA - and full patches for the rest
            o = _level_align(f, rois, view_idx, on_lvl & fits_small,
                             float(strides[i]), output_size, sampling_ratio,
                             rois_per_step, small_patch, interpret)
            o = o + _level_align(f, rois, view_idx,
                                 on_lvl & fits & ~fits_small,
                                 float(strides[i]), output_size,
                                 sampling_ratio, rois_per_step, patch,
                                 interpret)
        out = o if out is None else out + o

    if overflow_bucket > 0:
        R = rois.shape[0]
        K = min(overflow_bucket, R)
        over = ~fits
        sel = jnp.argsort(~over, stable=True)[:K]
        o_small = multilevel_roi_align(feats, rois[sel], view_idx[sel],
                                       strides, output_size, sampling_ratio,
                                       finest_scale)
        o_small = o_small * over[sel][:, None, None, None]
        out = out.at[sel].add(o_small.astype(out.dtype))
    return out
