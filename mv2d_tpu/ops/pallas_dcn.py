"""Modulated deformable conv (DCNv2) sampling as a Pallas band kernel.

The XLA path (ops/dcn.py) gathers one 4C-wide row per (pixel, tap) sample:
~304k descriptors per stage-3 layer, descriptor-rate bound (~63 GB/s
effective, 9.9 ms/layer on v5e).  This kernel replaces the gathers with
dense band algebra:

  * one DMA per (view, row-block) brings a full-width input band
    [BH, W, C] into VMEM (large sequential rows, near-peak HBM),
  * per 8-column segment, the 9 taps x 64 pixels = 576 bilinear samples
    are ONE MXU matmul: W2D [576, BH*WW] @ window [BH*WW, C], where row q
    of W2D is the 4-nonzero bilinear stencil hat_y*hat_x*mask of sample q
    over the flattened window (built on the VPU from broadcast hats -
    no per-sample intermediate ever materializes),
  * `pallas_dcn_conv` then contracts the tap weights IN-KERNEL (nine
    [64, C] @ [C, F] dots per segment) and emits the conv output
    [V, Ho, Wo, F] directly - the modulated samples tensor [V, Ho, Wo, 9C]
    (~156 MB per stage-3 layer) never reaches HBM.  `pallas_dcn_samples`
    (the samples-only form) remains for parity tests,
  * samples whose learned offset leaves the band window (|dy| or |dx|
    beyond ~7 px; rare in trained models - offsets are zero-init) are
    computed exactly by the XLA gather path for up to `overflow_bucket`
    samples and folded in afterwards, so results match ops/dcn.py exactly.

Inference only: tangents are ZERO (custom_jvp); training uses the
differentiable XLA gather path (ref: mmcv ModulatedDeformConv2d CUDA op,
used via configs/mv2d/exp/..._ep24.py:28-30).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# band shape: output rows per grid step x output cols per segment.
# Env-tunable for A/B (fatter bands = fewer grid steps + bigger MXU dots
# at the cost of relatively larger halos): MV2D_DCN_RB / MV2D_DCN_SW.
RB = int(_os.environ.get('MV2D_DCN_RB', '8'))
SW = int(_os.environ.get('MV2D_DCN_SW', '8'))


def _stencil(cy_ref, cx_ref, sy_ref, sx_ref, m_ref, band, *, stride: int,
             wp_in: int, ww: int):
    """Shared stencil-panel sampling: returns (samples [Q, C] f32)."""
    s = pl.program_id(1)
    C = band.shape[-1]
    bh = band.shape[0]
    # all quantities are multiples of 8 (SW=8, ww=8*stride+16, Wp%8==0) but
    # Mosaic cannot prove it through the clip; assert alignment explicitly
    xw0 = pl.multiple_of(
        jnp.clip(s * SW * stride - 8, 0, max(wp_in - ww, 0)), 8)

    ys = sy_ref[0, 0]                                  # [1, Q] row vector
    xs = sx_ref[0, 0]
    mm = m_ref[0, 0]
    # build TRANSPOSED [J, Q]: cell coords go on sublanes ([J, 1] consts),
    # sample coords stay a natural [1, Q] row - no relayouts either way
    hy = jnp.maximum(1.0 - jnp.abs(cy_ref[:, :1] - ys), 0.0)   # [J, Q]
    hx = jnp.maximum(1.0 - jnp.abs(cx_ref[:, :1] - xs), 0.0)
    w2dt = hy * hx * mm                                # [J, Q]

    win = band[:, pl.ds(xw0, ww), :].reshape(bh * ww, C)
    smp = jax.lax.dot_general(
        w2dt.astype(band.dtype), win, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [Q, C]
    return smp


def _kernel_samples(cy_ref, cx_ref, x_ref, sy_ref, sx_ref, m_ref, out_ref,
                    band, sem, *, nb: int, bh: int, ww: int, stride: int,
                    h_in: int, wp_in: int):
    """Grid (V*NB, NSg) - segments are a grid dim (an unrolled in-kernel
    segment loop made Mosaic compile time quadratic in W).

    cy/cx_ref: [J, 1] window cell coordinates (host consts, j = yy*ww+xx);
    x_ref: [V, Hp, Wp, C] (ANY); sy/sx/m: [1, 1, 1, Q=576] VMEM blocks
    (band/window-relative clipped coords, folded masks) in q = (tap, pixel)
    major order; out_ref: [1, 9, RB*SW, C]; band: [BH, Wp, C] scratch
    persists across the NSg steps of one row block (DMA'd at s == 0)."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    C = band.shape[-1]
    v = i // nb
    rb = i % nb
    y0 = jnp.clip(rb * RB * stride - 8, 0, max(h_in - bh, 0))

    @pl.when(s == 0)
    def _load_band():
        cp = pltpu.make_async_copy(x_ref.at[v, pl.ds(y0, bh)], band, sem)
        cp.start()
        cp.wait()

    smp = _stencil(cy_ref, cx_ref, sy_ref, sx_ref, m_ref, band,
                   stride=stride, wp_in=wp_in, ww=ww)
    # row-major block [9, RB, SW, C] at (i, 0, 0, s, 0): the output tensor
    # is [G, 9, RB, NSg*SW, C] whose pixel dims are already row-major, so
    # the conv_train wrapper's un-permute of y is a free reshape (the
    # round-4 eval _kernel_conv treatment applied to the samples form)
    out_ref[0] = smp.reshape(9, RB, SW, C).astype(out_ref.dtype)


def _kernel_conv(cy_ref, cx_ref, x_ref, sy_ref, sx_ref, m_ref, w_ref,
                 out_ref, band, sem, *, nb: int, bh: int, ww: int,
                 stride: int, h_in: int, wp_in: int):
    """As _kernel_samples, but contracts the tap weights in-kernel:
    w_ref [9*C, F] (rows tap-major); out_ref [1, RB*SW, F]."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    C = band.shape[-1]
    F = w_ref.shape[-1]
    v = i // nb
    rb = i % nb
    y0 = jnp.clip(rb * RB * stride - 8, 0, max(h_in - bh, 0))

    @pl.when(s == 0)
    def _load_band():
        cp = pltpu.make_async_copy(x_ref.at[v, pl.ds(y0, bh)], band, sem)
        cp.start()
        cp.wait()

    smp = _stencil(cy_ref, cx_ref, sy_ref, sx_ref, m_ref, band,
                   stride=stride, wp_in=wp_in, ww=ww)
    smp = smp.astype(band.dtype)                       # [Q, C] (q-major)
    acc = jnp.zeros((RB * SW, F), jnp.float32)
    for t in range(9):
        acc = acc + jax.lax.dot_general(
            smp[t * RB * SW:(t + 1) * RB * SW, :],
            w_ref[pl.ds(t * C, C), :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # out block [1, RB, SW, F] at (i, 0, s, 0): the output tensor is
    # row-major [G, RB, Wop, F], so the wrapper's un-permute is a free
    # leading-dim reshape instead of a ~2 ms [V, Hop, Wop, F] transpose
    out_ref[0] = acc.reshape(RB, SW, F).astype(out_ref.dtype)


def _kernel_samples_bwd(cy_ref, cx_ref, x_ref, sy_ref, sx_ref, m_ref,
                        ds_ref, dband_ref, dsy_ref, dsx_ref, dm_ref,
                        band, sem, *, nb: int, bh: int, ww: int,
                        stride: int, h_in: int, wp_in: int):
    """Adjoint of _kernel_samples: the same band algebra transposed.

    ds_ref: [1, 9, RB*SW, C] upstream sample grads (fwd output layout);
    dband_ref: [1, bh, Wp, C] f32 - CONSTANT index over the segment dim, so
    the block accumulates the per-segment dX windows in VMEM and is flushed
    once per row block (overlapping windows between segments overlap-add
    here; overlapping BANDS between row blocks overlap-add in XLA outside);
    dsy/dsx/dm_ref: [1, 1, 1, Q] per-sample coordinate/modulation grads.

    Coordinate grads use the FLOOR-form bilinear derivative (-1 at the
    floor cell, +1 at floor+1) rather than the hat-sign form: they differ
    exactly at integer coordinates, where the offset branch starts
    (zero-init offsets => all-integer coords), and the floor form is what
    the XLA gather path (ops/dcn._dense_bilinear) differentiates to."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    C = band.shape[-1]
    v = i // nb
    rb = i % nb
    y0 = jnp.clip(rb * RB * stride - 8, 0, max(h_in - bh, 0))

    @pl.when(s == 0)
    def _load_band():
        cp = pltpu.make_async_copy(x_ref.at[v, pl.ds(y0, bh)], band, sem)
        cp.start()
        cp.wait()
        dband_ref[:] = jnp.zeros_like(dband_ref)

    xw0 = pl.multiple_of(
        jnp.clip(s * SW * stride - 8, 0, max(wp_in - ww, 0)), 8)
    ys = sy_ref[0, 0]                                  # [1, Q]
    xs = sx_ref[0, 0]
    mm = m_ref[0, 0]
    cy = cy_ref[:, :1]                                 # [J, 1]
    cx = cx_ref[:, :1]
    hy = jnp.maximum(1.0 - jnp.abs(cy - ys), 0.0)      # [J, Q]
    hx = jnp.maximum(1.0 - jnp.abs(cx - xs), 0.0)
    w2dt = hy * hx * mm

    dsm = ds_ref[0].reshape(9 * RB * SW, C).astype(jnp.float32)  # [Q, C]
    # dX window: dWin[j, c] = sum_q W2D[j, q] dS[q, c] - one MXU dot
    dwin = jax.lax.dot_general(
        w2dt, dsm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [J, C]
    dband_ref[0, :, pl.ds(xw0, ww), :] += dwin.reshape(bh, ww, C)

    # dW2D[j, q] = sum_c Win[j, c] dS[q, c] - one MXU dot
    win = band[:, pl.ds(xw0, ww), :].reshape(bh * ww, C).astype(jnp.float32)
    dw2d = jax.lax.dot_general(
        win, dsm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [J, Q]
    f0y = jnp.floor(ys)
    f0x = jnp.floor(xs)
    dhy = ((cy == f0y + 1.0).astype(jnp.float32)
           - (cy == f0y).astype(jnp.float32))          # [J, Q]
    dhx = ((cx == f0x + 1.0).astype(jnp.float32)
           - (cx == f0x).astype(jnp.float32))
    dm_ref[0, 0, 0] = (hy * hx * dw2d).sum(0)
    dsy_ref[0, 0, 0] = (dhy * hx * dw2d).sum(0) * mm[0]
    dsx_ref[0, 0, 0] = (hy * dhx * dw2d).sum(0) * mm[0]


def _kernel_conv_bwd(cy_ref, cx_ref, x_ref, sy_ref, sx_ref, m_ref, w_ref,
                     dy_ref, dband_ref, dsy_ref, dsx_ref, dm_ref, dw_ref,
                     band, sem, *, nb: int, bh: int, ww: int, stride: int,
                     h_in: int, wp_in: int):
    """Combined adjoint of _kernel_conv: ONE pass produces dX windows,
    coordinate/modulation grads AND the tap-weight grad - the modulated
    samples tensor [V, Ho, Wo, 9C] (~156 MB/stage-3 layer) never touches
    HBM in either direction (it is recomputed per segment as one MXU dot).

    dy_ref: [1, RB, SW, F] upstream output grads in the forward's
    row-major layout; dw_ref: [9C, F] f32 - CONSTANT index over the WHOLE
    grid (sequential), zeroed at the first step and accumulated;
    dband/dsy/dsx/dm as in _kernel_samples_bwd."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    C = band.shape[-1]
    F = w_ref.shape[-1]
    v = i // nb
    rb = i % nb
    y0 = jnp.clip(rb * RB * stride - 8, 0, max(h_in - bh, 0))

    @pl.when(s == 0)
    def _load_band():
        cp = pltpu.make_async_copy(x_ref.at[v, pl.ds(y0, bh)], band, sem)
        cp.start()
        cp.wait()
        dband_ref[:] = jnp.zeros_like(dband_ref)

    @pl.when((i == 0) & (s == 0))
    def _zero_dw():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    xw0 = pl.multiple_of(
        jnp.clip(s * SW * stride - 8, 0, max(wp_in - ww, 0)), 8)
    ys = sy_ref[0, 0]                                  # [1, Q]
    xs = sx_ref[0, 0]
    mm = m_ref[0, 0]
    cy = cy_ref[:, :1]                                 # [J, 1]
    cx = cx_ref[:, :1]
    hy = jnp.maximum(1.0 - jnp.abs(cy - ys), 0.0)      # [J, Q]
    hx = jnp.maximum(1.0 - jnp.abs(cx - xs), 0.0)
    w2dt = hy * hx * mm

    win_raw = band[:, pl.ds(xw0, ww), :].reshape(bh * ww, C)
    # recompute the forward's samples exactly (same dot, same rounding)
    smp = jax.lax.dot_general(
        w2dt.astype(band.dtype), win_raw, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [Q, C]
    smp = smp.astype(band.dtype)

    dyseg = dy_ref[0].reshape(RB * SW, F).astype(band.dtype)
    QP = RB * SW
    parts = []
    for t in range(9):
        # ds_t[q, c] = sum_f dy[q, f] w[t, c, f] - the sample grads
        parts.append(jax.lax.dot_general(
            dyseg, w_ref[pl.ds(t * C, C), :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))       # [QP, C]
        # dw_t[c, f] = sum_q smp_t[q, c] dy[q, f]
        dw_t = jax.lax.dot_general(
            smp[t * QP:(t + 1) * QP, :], dyseg, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [C, F]
        dw_ref[pl.ds(t * C, C), :] += dw_t
    dsm = jnp.concatenate(parts, axis=0)               # [Q, C] f32

    # dX window: dWin[j, c] = sum_q W2D[j, q] dS[q, c]
    dwin = jax.lax.dot_general(
        w2dt, dsm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [J, C]
    dband_ref[0, :, pl.ds(xw0, ww), :] += dwin.reshape(bh, ww, C)

    # dW2D[j, q] = sum_c Win[j, c] dS[q, c]
    win = win_raw.astype(jnp.float32)
    dw2d = jax.lax.dot_general(
        win, dsm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [J, Q]
    f0y = jnp.floor(ys)
    f0x = jnp.floor(xs)
    dhy = ((cy == f0y + 1.0).astype(jnp.float32)
           - (cy == f0y).astype(jnp.float32))
    dhx = ((cx == f0x + 1.0).astype(jnp.float32)
           - (cx == f0x).astype(jnp.float32))
    dm_ref[0, 0, 0] = (hy * hx * dw2d).sum(0)
    dsy_ref[0, 0, 0] = (dhy * hx * dw2d).sum(0) * mm[0]
    dsx_ref[0, 0, 0] = (hy * dhx * dw2d).sum(0) * mm[0]


def _run_conv_bwd(xp, psy, psx, pm, w, dy, stride, bh, ww, interpret):
    """dy: [G, RB, NSg*SW, F] (fwd row-major layout) -> (dbands
    [G, bh, Wp, C] f32, dpsy/dpsx/dpm [G, NSg, 1, Q] f32, dw [9C, F] f32).
    """
    V_, Hp, Wp, C = xp.shape
    G, nsg = psy.shape[0], psy.shape[1]
    Q = 9 * RB * SW
    F = w.shape[-1]
    cy, cx = _cell_coords(bh, ww)
    J = bh * ww
    coord_spec = pl.BlockSpec((1, 1, 1, Q), lambda i, s: (i, s, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel_conv_bwd, nb=G // V_, bh=bh, ww=ww,
                          stride=stride, h_in=Hp, wp_in=Wp),
        grid=(G, nsg),
        in_specs=[pl.BlockSpec((J, 1), lambda i, s: (0, 0)),
                  pl.BlockSpec((J, 1), lambda i, s: (0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  coord_spec, coord_spec, coord_spec,
                  pl.BlockSpec((9 * C, F), lambda i, s: (0, 0)),
                  pl.BlockSpec((1, RB, SW, F), lambda i, s: (i, 0, s, 0))],
        out_specs=[pl.BlockSpec((1, bh, Wp, C), lambda i, s: (i, 0, 0, 0)),
                   coord_spec, coord_spec, coord_spec,
                   pl.BlockSpec((9 * C, F), lambda i, s: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((G, bh, Wp, C), jnp.float32),
                   jax.ShapeDtypeStruct((G, nsg, 1, Q), jnp.float32),
                   jax.ShapeDtypeStruct((G, nsg, 1, Q), jnp.float32),
                   jax.ShapeDtypeStruct((G, nsg, 1, Q), jnp.float32),
                   jax.ShapeDtypeStruct((9 * C, F), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bh, Wp, C), xp.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(cy, cx, xp, psy, psx, pm, w, dy)


@functools.lru_cache(maxsize=None)
def _make_band_conv(stride, bh, ww, interpret):
    """Differentiable in-kernel-contraction band DCN over the PACKED
    inputs (training): forward = _run_conv (row-major [G, RB, NSg*SW, F],
    free un-permute), backward = ONE combined kernel (_kernel_conv_bwd)
    that recomputes samples per segment and emits dX/dsy/dsx/dm/dw -
    neither direction materializes the [.., 9C] samples tensor in HBM."""

    @jax.custom_vjp
    def f(xp, psy, psx, pm, w):
        return _run_conv(xp, psy, psx, pm, w, stride, bh, ww, interpret)

    def fwd(xp, psy, psx, pm, w):
        return f(xp, psy, psx, pm, w), (xp, psy, psx, pm, w)

    def bwd(res, g):
        xp, psy, psx, pm, w = res
        V_, Hp, Wp, C = xp.shape
        G = psy.shape[0]
        nb = G // V_
        dbands, dpsy, dpsx, dpm, dw = _run_conv_bwd(
            xp, psy, psx, pm, w, g.astype(xp.dtype), stride, bh, ww,
            interpret)
        dbands = dbands.reshape(V_, nb, bh, Wp, C)
        dxp = jnp.zeros((V_, Hp, Wp, C), jnp.float32)
        for rb in range(nb):
            y0 = min(max(rb * RB * stride - 8, 0), max(Hp - bh, 0))
            dxp = dxp.at[:, y0:y0 + bh].add(dbands[:, rb])
        return (dxp.astype(xp.dtype), dpsy.astype(psy.dtype),
                dpsx.astype(psx.dtype), dpm.astype(pm.dtype),
                dw.astype(w.dtype))

    f.defvjp(fwd, bwd)
    return f


def _run_samples_bwd(xp, psy, psx, pm, ds, stride, bh, ww, interpret):
    """ds: [G, 9, RB, NSg*SW, C] (the fwd's row-major layout) ->
    (dbands [G, bh, Wp, C] f32, dpsy/dpsx/dpm [G, NSg, 1, Q] f32)."""
    V_, Hp, Wp, C = xp.shape
    G, nsg = psy.shape[0], psy.shape[1]
    Q = 9 * RB * SW
    cy, cx = _cell_coords(bh, ww)
    J = bh * ww
    coord_spec = pl.BlockSpec((1, 1, 1, Q), lambda i, s: (i, s, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel_samples_bwd, nb=G // V_, bh=bh, ww=ww,
                          stride=stride, h_in=Hp, wp_in=Wp),
        grid=(G, nsg),
        in_specs=[pl.BlockSpec((J, 1), lambda i, s: (0, 0)),
                  pl.BlockSpec((J, 1), lambda i, s: (0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  coord_spec, coord_spec, coord_spec,
                  pl.BlockSpec((1, 9, RB, SW, C),
                               lambda i, s: (i, 0, 0, s, 0))],
        out_specs=[pl.BlockSpec((1, bh, Wp, C), lambda i, s: (i, 0, 0, 0)),
                   coord_spec, coord_spec, coord_spec],
        out_shape=[jax.ShapeDtypeStruct((G, bh, Wp, C), jnp.float32),
                   jax.ShapeDtypeStruct((G, nsg, 1, Q), jnp.float32),
                   jax.ShapeDtypeStruct((G, nsg, 1, Q), jnp.float32),
                   jax.ShapeDtypeStruct((G, nsg, 1, Q), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bh, Wp, C), xp.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(cy, cx, xp, psy, psx, pm, ds)


@functools.lru_cache(maxsize=None)
def _make_band_sample(stride, bh, ww, interpret):
    """Differentiable band sampling over the PACKED inputs: the geometry
    (pad/clip/mask-fold/packing) stays plain XLA so its VJP is automatic;
    only the stencil kernel itself carries the custom VJP."""

    @jax.custom_vjp
    def f(xp, psy, psx, pm):
        return _run_samples(xp, psy, psx, pm, stride, bh, ww, interpret)

    def fwd(xp, psy, psx, pm):
        return f(xp, psy, psx, pm), (xp, psy, psx, pm)

    def bwd(res, g):
        xp, psy, psx, pm = res
        V_, Hp, Wp, C = xp.shape
        G = psy.shape[0]
        nb = G // V_
        dbands, dpsy, dpsx, dpm = _run_samples_bwd(
            xp, psy, psx, pm, g.astype(xp.dtype), stride, bh, ww,
            interpret)
        # overlap-add the per-row-block band grads (band origins are
        # static python ints: nb static slice adds, no scatter)
        dbands = dbands.reshape(V_, nb, bh, Wp, C)
        dxp = jnp.zeros((V_, Hp, Wp, C), jnp.float32)
        for rb in range(nb):
            y0 = min(max(rb * RB * stride - 8, 0), max(Hp - bh, 0))
            dxp = dxp.at[:, y0:y0 + bh].add(dbands[:, rb])
        return (dxp.astype(xp.dtype), dpsy.astype(psy.dtype),
                dpsx.astype(psx.dtype), dpm.astype(pm.dtype))

    f.defvjp(fwd, bwd)
    return f


def dcn_modulated_samples(x: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                          m: jnp.ndarray, stride: int = 1,
                          overflow_bucket: int = 2048,
                          interpret: bool | None = None) -> jnp.ndarray:
    """DIFFERENTIABLE band-kernel DCN sampling (training path).

    Same contract as pallas_dcn_samples - x: [V, H, W, C], sy/sx/m:
    [V, Ho, Wo, 9] -> modulated bilinear samples [V, Ho, Wo, 9*C]
    (tap-major) - but with gradients to x, sy, sx and m: the forward is
    the stencil-panel band kernel, the backward one transposed band kernel
    (dX and dW2D are one MXU dot per segment each).  The out-of-band
    overflow path is plain XLA gather/scatter, so autodiff covers it."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    xp, psy, psx, pm, dims, over_info = _geometry(x, sy, sx, m, stride)
    V, C = dims['V'], dims['C']
    Ho, Wo, nb, nsg = dims['Ho'], dims['Wo'], dims['nb'], dims['nsg']
    Hop, Wop = dims['Hop'], dims['Wop']
    samples = _make_band_sample(stride, dims['bh'], dims['ww'], interpret)(
        xp, psy, psx, pm)                      # [V*nb, 9, RB, nsg*SW, C]
    samples = samples.reshape(V, nb, 9, RB, nsg * SW, C)
    samples = samples.transpose(0, 1, 3, 4, 2, 5)
    samples = samples.reshape(V, Hop, Wop, 9, C)[:, :Ho, :Wo]

    if overflow_bucket > 0:
        def add_overflow(samples):
            sel, flat_over, P = _overflow_select(dims, over_info,
                                                 overflow_bucket)
            vals = _overflow_values(x, dims, over_info, sel, flat_over)
            flat = samples.reshape(P, C)
            flat = flat.at[sel].add(vals.astype(flat.dtype), mode='drop')
            return flat.reshape(V, Ho, Wo, 9, C)

        samples = jax.lax.cond(
            _any_overflow(dims, over_info), add_overflow,
            lambda s: s.reshape(V, Ho, Wo, 9, C), samples)
    return samples.reshape(V, Ho, Wo, 9 * C)


def dcn_modulated_conv_train(x: jnp.ndarray, sy: jnp.ndarray,
                             sx: jnp.ndarray, m: jnp.ndarray,
                             w: jnp.ndarray, stride: int = 1,
                             overflow_bucket: int = 2048,
                             interpret: bool | None = None) -> jnp.ndarray:
    """DIFFERENTIABLE band-kernel DCN with the tap-weight contraction
    reordered around the sampler's NATIVE layout (training path).

    Default: the band samples kernel (row-major pixel layout, so the
    output un-permute is a free reshape) + nine big [N, C] @ [C, F] XLA
    tap GEMMs; backward = the transposed band kernel via the samples
    custom VJP, with the dw/dsamples dots plain XLA matmuls.
    MV2D_DCN_TRAIN_FUSED=1 routes the fully-fused form instead (_run_conv
    forward + _kernel_conv_bwd combined backward, samples never reach
    HBM) - measured SLOWER at recipe shapes (336.2 vs 320.1 ms/scene):
    its per-segment 64-row tap dots waste more MXU than the saved HBM
    round trip, kept for revival at bandwidth-starved shapes.
    Out-of-band overflow samples are contracted by plain XLA and
    scatter-added (bounded, <= overflow_bucket rows), so autodiff covers
    their grads.
    x: [V, H, W, C]; sy/sx/m: [V, Ho, Wo, 9]; w: [9*C*F or (9, C, F)] ->
    [V, Ho, Wo, F].
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    xp, psy, psx, pm, dims, over_info = _geometry(x, sy, sx, m, stride)
    V, C = dims['V'], dims['C']
    Ho, Wo, nb, nsg = dims['Ho'], dims['Wo'], dims['nb'], dims['nsg']
    Hop, Wop = dims['Hop'], dims['Wop']
    w9 = w.reshape(9, C, -1)
    F = w9.shape[-1]
    # default = samples kernel + big XLA tap GEMMs: the fully-fused
    # in-kernel contraction (MV2D_DCN_TRAIN_FUSED=1) measured 336.2 vs
    # 320.1 ms/scene same-session - its per-segment 64-row dots lose more
    # MXU than the saved samples-tensor HBM round trip buys (PERF.md r5)
    if _os.environ.get('MV2D_DCN_TRAIN_FUSED', '0') == '1':
        y = _make_band_conv(stride, dims['bh'], dims['ww'], interpret)(
            xp, psy, psx, pm, w9.reshape(9 * C, F))  # [V*nb,RB,nsg*SW,F]
        y = y.reshape(V, Hop, Wop, F)[:, :Ho, :Wo]
    else:
        # samples kernel + 9 XLA tap dots (one big GEMM per tap beats the
        # fused in-kernel 64-row dots, A/B'd in PERF.md round 5); the
        # kernel's row-major pixel layout makes the final un-permute a
        # free reshape
        raw = _make_band_sample(stride, dims['bh'], dims['ww'], interpret)(
            xp, psy, psx, pm)                  # [V*nb, 9, RB, nsg*SW, C]
        N = raw.shape[0] * raw.shape[2] * raw.shape[3]
        acc = None
        for t in range(9):
            part = jax.lax.dot_general(
                raw[:, t].reshape(N, C), w9[t].astype(raw.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        y = acc.reshape(V, Hop, Wop, F)[:, :Ho, :Wo]
    y = y.astype(x.dtype)

    if overflow_bucket > 0:
        def add_overflow(y):
            sel, flat_over, P = _overflow_select(dims, over_info,
                                                 overflow_bucket)
            vals = _overflow_values(x, dims, over_info, sel, flat_over)
            tap = sel % 9
            contrib = None
            for t in range(9):
                sm = (tap == t).astype(vals.dtype)[:, None]
                part = jax.lax.dot_general(
                    (vals * sm).astype(x.dtype), w9[t].astype(x.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                contrib = part if contrib is None else contrib + part
            # sentinel slots: sel == P -> pixel index V*Ho*Wo (OOB) -> drop
            flat = y.reshape(V * Ho * Wo, F)
            flat = flat.at[sel // 9].add(contrib.astype(flat.dtype),
                                         mode='drop')
            return flat.reshape(V, Ho, Wo, F)

        y = jax.lax.cond(_any_overflow(dims, over_info), add_overflow,
                         lambda yy: yy, y)
    return y


def _cell_coords(bh, ww):
    J = bh * ww
    jj = np.arange(J)
    cy = jnp.asarray((jj // ww)[:, None], jnp.float32)   # [J, 1]
    cx = jnp.asarray((jj % ww)[:, None], jnp.float32)
    return cy, cx


def _run_samples(x, sy, sx, m, stride, bh, ww, interpret):
    """x: [V, Hp, Wp, C]; sy/sx/m: [V*NB, NSg, 1, Q=9*64] (q-major) ->
    [V*NB, 9, RB, NSg*SW, C] (pixel dims row-major)."""
    V, Hp, Wp, C = x.shape
    G, nsg = sy.shape[0], sy.shape[1]
    Q = 9 * RB * SW
    cy, cx = _cell_coords(bh, ww)
    J = bh * ww
    out = pl.pallas_call(
        functools.partial(_kernel_samples, nb=G // V, bh=bh, ww=ww,
                          stride=stride, h_in=Hp, wp_in=Wp),
        grid=(G, nsg),
        in_specs=[pl.BlockSpec((J, 1), lambda i, s: (0, 0)),
                  pl.BlockSpec((J, 1), lambda i, s: (0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 1, 1, Q), lambda i, s: (i, s, 0, 0)),
                  pl.BlockSpec((1, 1, 1, Q), lambda i, s: (i, s, 0, 0)),
                  pl.BlockSpec((1, 1, 1, Q), lambda i, s: (i, s, 0, 0))],
        out_specs=pl.BlockSpec((1, 9, RB, SW, C),
                               lambda i, s: (i, 0, 0, s, 0)),
        out_shape=jax.ShapeDtypeStruct((G, 9, RB, nsg * SW, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((bh, Wp, C), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(cy, cx, x, sy, sx, m)
    return out


def _run_conv(x, sy, sx, m, w, stride, bh, ww, interpret):
    """As _run_samples but contracts w [9C, F] in-kernel ->
    [V*NB, NSg*64, F]."""
    V, Hp, Wp, C = x.shape
    G, nsg = sy.shape[0], sy.shape[1]
    Q = 9 * RB * SW
    F = w.shape[-1]
    cy, cx = _cell_coords(bh, ww)
    J = bh * ww
    out = pl.pallas_call(
        functools.partial(_kernel_conv, nb=G // V, bh=bh, ww=ww,
                          stride=stride, h_in=Hp, wp_in=Wp),
        grid=(G, nsg),
        in_specs=[pl.BlockSpec((J, 1), lambda i, s: (0, 0)),
                  pl.BlockSpec((J, 1), lambda i, s: (0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 1, 1, Q), lambda i, s: (i, s, 0, 0)),
                  pl.BlockSpec((1, 1, 1, Q), lambda i, s: (i, s, 0, 0)),
                  pl.BlockSpec((1, 1, 1, Q), lambda i, s: (i, s, 0, 0)),
                  pl.BlockSpec((9 * C, F), lambda i, s: (0, 0))],
        out_specs=pl.BlockSpec((1, RB, SW, F), lambda i, s: (i, 0, s, 0)),
        out_shape=jax.ShapeDtypeStruct((G, RB, nsg * SW, F), x.dtype),
        scratch_shapes=[pltpu.VMEM((bh, Wp, C), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(cy, cx, x, sy, sx, m, w)
    return out


def _geometry(x, sy, sx, m, stride):
    """Shared band geometry + packed sample coords.

    Returns (xp, packed (sy, sx, meff), dims dict)."""
    V, H, W, C = x.shape
    Ho, Wo = sy.shape[1], sy.shape[2]
    # band geometry (8-aligned origins; margins give ~±7px offset coverage)
    Hp = -(-H // 8) * 8
    Wp = -(-W // 8) * 8
    bh = min(RB * stride + 16, Hp)
    ww = min(SW * stride + 16, Wp)
    # ceil: Ho need not divide RB (R101 @ 1600x640 has a 20-row stage-4
    # map; the floor form under-covered it and produced negative pads)
    nb = max(-(-Ho // RB), 1)
    nsg = -(-Wo // SW)
    Hop, Wop = nb * RB, nsg * SW

    xp = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))

    # pad output grid; padded pixels carry zero mask
    def padp(a):
        return jnp.pad(a, ((0, 0), (0, Hop - Ho), (0, Wop - Wo), (0, 0)))

    syp, sxp, mp = padp(sy), padp(sx), padp(m)
    inside = (sxp > -1.0) & (sxp < W) & (syp > -1.0) & (syp < H)
    syc = jnp.clip(syp, 0.0, H - 1.0)
    sxc = jnp.clip(sxp, 0.0, W - 1.0)

    rows = jnp.arange(Hop)
    cols = jnp.arange(Wop)
    y0b = jnp.clip((rows // RB) * RB * stride - 8, 0, max(Hp - bh, 0))
    xw0b = jnp.clip((cols // SW) * SW * stride - 8, 0, max(Wp - ww, 0))
    ys_rel = syc - y0b[None, :, None, None]
    xs_rel = sxc - xw0b[None, None, :, None]
    inband = ((ys_rel >= 0.0) & (ys_rel <= bh - 1) &
              (xs_rel >= 0.0) & (xs_rel <= ww - 1))
    pix_valid = (rows[:, None] < Ho) & (cols[None, :] < Wo)
    meff = mp * (inside & inband & pix_valid[None, :, :, None])

    def pack(a):   # [V, Hop, Wop, 9] -> [V*NB, NSg, 1, 9*RB*SW] (q-major:
        # q = tap*64 + row*SW + col, matching the kernel's output layout)
        a = a.reshape(V, nb, RB, nsg, SW, 9)
        a = a.transpose(0, 1, 3, 5, 2, 4)
        return a.reshape(V * nb, nsg, 1, 9 * RB * SW)

    dims = dict(V=V, H=H, W=W, C=C, Ho=Ho, Wo=Wo, nb=nb, nsg=nsg,
                Hop=Hop, Wop=Wop, bh=bh, ww=ww)
    over_info = (inside, inband, pix_valid, sxp, syp, mp)
    return (xp, pack(ys_rel.astype(jnp.float32)),
            pack(xs_rel.astype(jnp.float32)),
            pack(meff.astype(jnp.float32)), dims, over_info)


def _over_mask(dims, over_info):
    """[V, Ho, Wo, 9] mask of exact-path (out-of-band) samples."""
    Ho, Wo = dims['Ho'], dims['Wo']
    inside, inband, pix_valid, sxp, syp, mp = over_info
    return (inside & ~inband & pix_valid[None, :, :, None] &
            (mp != 0.0))[:, :Ho, :Wo]


def _any_overflow(dims, over_info):
    return jnp.any(_over_mask(dims, over_info))


def _overflow_select(dims, over_info, overflow_bucket):
    """Indices (into the flat [V*Ho*Wo*9] sample space) of out-of-band
    samples, compacted into a K-slot buffer with sentinel P."""
    V, Ho, Wo = dims['V'], dims['Ho'], dims['Wo']
    over = _over_mask(dims, over_info)
    P = V * Ho * Wo * 9
    K = min(overflow_bucket, P)
    flat_over = over.reshape(P)
    # stable compaction of the (rare) overflow indices WITHOUT a scatter:
    # a P-update scatter into the K-slot buffer is descriptor-bound on TPU
    # (~1.4 ms at P=304k).  Gather formulation instead: chunk the mask into
    # lanes-wide rows, per-chunk inclusive cumsum + chunk-base prefix, then
    # for each output slot j find (chunk, column) of the j-th set bit with
    # dense compares.  Unused slots keep the P sentinel so the final
    # scatter-add drops them (a 0 sentinel would duplicate-add sample 0).
    S = 512
    ncp = -(-P // S) * S
    m = jnp.pad(flat_over, (0, ncp - P)).reshape(-1, S)
    within = jnp.cumsum(m.astype(jnp.int32), axis=1)        # [NCH, S]
    counts = within[:, -1]                                  # [NCH]
    end = jnp.cumsum(counts)
    base = end - counts                                     # exclusive
    j = jnp.arange(K, dtype=jnp.int32)
    # chunk holding the j-th set bit: first chunk with end > j
    chunk_id = jnp.sum((end[None, :] <= j[:, None]).astype(jnp.int32),
                       axis=1)
    chunk_id = jnp.minimum(chunk_id, m.shape[0] - 1)
    r = j - base[chunk_id]
    rows = within[chunk_id]                                 # [K, S]
    # first column with cumsum == r+1  <=>  count of columns with <= r
    col = jnp.sum((rows <= r[:, None]).astype(jnp.int32), axis=1)
    idx = chunk_id * S + jnp.minimum(col, S - 1)
    sel = jnp.where(j < end[-1], idx, P).astype(jnp.int32)
    return sel, flat_over, P


def _overflow_values(x, dims, over_info, sel, flat_over):
    """Exact modulated bilinear values [K, C] for the selected samples."""
    V, Ho, Wo = dims['V'], dims['Ho'], dims['Wo']
    inside, inband, pix_valid, sxp, syp, mp = over_info
    P = V * Ho * Wo * 9
    vi = (sel // (Ho * Wo * 9)).astype(jnp.int32)
    from .roi_align import _bilinear_gather
    vals = _bilinear_gather(
        x, vi, sxp[:, :Ho, :Wo].reshape(P)[sel][:, None],
        syp[:, :Ho, :Wo].reshape(P)[sel][:, None])[:, 0]
    return vals * (mp[:, :Ho, :Wo].reshape(P)[sel]
                   * flat_over[sel])[:, None]


@functools.lru_cache(maxsize=None)
def _make_samples_apply(stride, overflow_bucket, interpret):
    @jax.custom_jvp
    def f(x, sy, sx, m):
        return _samples_impl(x, sy, sx, m, stride, overflow_bucket,
                             interpret)

    @f.defjvp
    def _jvp(primals, tangents):
        out = f(*primals)
        return out, jnp.zeros_like(out)

    return f


def pallas_dcn_samples(x: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                       m: jnp.ndarray, stride: int = 1,
                       overflow_bucket: int = 2048,
                       interpret: bool | None = None) -> jnp.ndarray:
    """x: [V, H, W, C]; sy/sx: [V, Ho, Wo, 9] absolute sample coords;
    m: [V, Ho, Wo, 9] modulation.  Returns modulated bilinear samples
    [V, Ho, Wo, 9*C] (tap-major), matching ops/dcn's gather+modulate
    exactly.  NO gradient (zero tangents) - inference only."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    return _make_samples_apply(stride, overflow_bucket, interpret)(
        x, sy, sx, m)


def _samples_impl(x, sy, sx, m, stride, overflow_bucket, interpret):
    xp, psy, psx, pm, dims, over_info = _geometry(x, sy, sx, m, stride)
    V, C = dims['V'], dims['C']
    Ho, Wo, nb, nsg = dims['Ho'], dims['Wo'], dims['nb'], dims['nsg']
    Hop, Wop = dims['Hop'], dims['Wop']
    samples = _run_samples(xp, psy, psx, pm, stride, dims['bh'],
                           dims['ww'], interpret)
    # [V*NB, 9, RB, NSg*SW, C] (row-major pixels) -> [V, Ho, Wo, 9, C]
    samples = samples.reshape(V, nb, 9, RB, nsg * SW, C)
    samples = samples.transpose(0, 1, 3, 4, 2, 5)
    samples = samples.reshape(V, Hop, Wop, 9, C)[:, :Ho, :Wo]

    if overflow_bucket > 0:
        def add_overflow(samples):
            sel, flat_over, P = _overflow_select(dims, over_info,
                                                 overflow_bucket)
            vals = _overflow_values(x, dims, over_info, sel, flat_over)
            flat = samples.reshape(P, C)
            flat = flat.at[sel].add(vals.astype(flat.dtype), mode='drop')
            return flat.reshape(V, Ho, Wo, 9, C)

        samples = jax.lax.cond(
            _any_overflow(dims, over_info), add_overflow,
            lambda s: s.reshape(V, Ho, Wo, 9, C), samples)
    return samples.reshape(V, Ho, Wo, 9 * C)


@functools.lru_cache(maxsize=None)
def _make_conv_apply(stride, overflow_bucket, interpret):
    @jax.custom_jvp
    def f(x, sy, sx, m, w):
        return _conv_impl(x, sy, sx, m, w, stride, overflow_bucket,
                          interpret)

    @f.defjvp
    def _jvp(primals, tangents):
        out = f(*primals)
        return out, jnp.zeros_like(out)

    return f


def pallas_dcn_conv(x: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                    m: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
                    overflow_bucket: int = 2048,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Full DCNv2 conv: samples contracted with w [9, C, F] (tap-major)
    IN-KERNEL.  Returns [V, Ho, Wo, F] == einsum('vhw(tc),(tc)f', samples,
    w) with the samples of pallas_dcn_samples.  Inference only."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    K2, C, F = w.shape
    return _make_conv_apply(stride, overflow_bucket, interpret)(
        x, sy, sx, m, w.reshape(K2 * C, F))


def _conv_impl(x, sy, sx, m, w, stride, overflow_bucket, interpret):
    xp, psy, psx, pm, dims, over_info = _geometry(x, sy, sx, m, stride)
    V, C = dims['V'], dims['C']
    Ho, Wo, nb, nsg = dims['Ho'], dims['Wo'], dims['nb'], dims['nsg']
    Hop, Wop = dims['Hop'], dims['Wop']
    F = w.shape[-1]
    wb = w.astype(x.dtype)
    out = _run_conv(xp, psy, psx, pm, wb, stride, dims['bh'], dims['ww'],
                    interpret)
    # [V*NB, RB, NSg*SW, F] row-major -> [V, Ho, Wo, F]: free reshape
    out = out.reshape(V, Hop, Wop, F)[:, :Ho, :Wo]

    if overflow_bucket > 0:
        # out-of-band samples are RARE (offsets are zero-init and stay
        # within the ±7 px band margin in trained models): gate the whole
        # select/gather/scatter path on the actual presence of one -
        # ungated it cost ~1.8 ms/step of custom fusions in the eval trace
        def add_overflow(out):
            sel, flat_over, P = _overflow_select(dims, over_info,
                                                 overflow_bucket)
            vals = _overflow_values(x, dims, over_info, sel, flat_over)
            K = sel.shape[0]
            tap = jnp.minimum(sel % 9, 8)
            # place each value in its tap's block of a [K, 9C] panel, then
            # one matmul with w folds the tap weights; add at the pixel
            panel = (vals[:, None, :].astype(wb.dtype)
                     * jax.nn.one_hot(tap, 9, dtype=wb.dtype)[:, :, None])
            contrib = jax.lax.dot_general(
                panel.reshape(K, 9 * C), wb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            pix = jnp.where(sel < P, sel // 9,
                            V * Ho * Wo).astype(jnp.int32)
            flat = out.reshape(V * Ho * Wo, F)
            flat = flat.at[pix].add(contrib.astype(flat.dtype),
                                    mode='drop')
            return flat.reshape(V, Ho, Wo, F)

        out = jax.lax.cond(_any_overflow(dims, over_info), add_overflow,
                           lambda o: o, out)
    return out
