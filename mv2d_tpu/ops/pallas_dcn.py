"""Modulated deformable conv (DCNv2) sampling as a Pallas band kernel.

The XLA path (ops/dcn.py) gathers one 4C-wide row per (pixel, tap) sample:
~304k descriptors per stage-3 layer, descriptor-rate bound (~63 GB/s
effective, 9.9 ms/layer on v5e).  This kernel replaces the gathers with
dense band algebra:

  * one DMA per (view, row-block) brings a full-width input band
    [BH, W, C] into VMEM (large sequential rows, near-peak HBM),
  * per 8-column segment, the 9 taps x 64 pixels = 576 bilinear samples
    factor into separable 1D hat weights; the y interpolation is ONE MXU
    matmul  T = Ay [576, BH] @ band [BH, WW*C]  and the x interpolation a
    short VPU reduction over the WW=24-cell window,
  * modulation masks fold into the x hats; the kernel emits raw modulated
    samples [V, Ho, Wo, 9C] and the tap-weight contraction runs as one
    big XLA matmul (perfect MXU shapes) outside,
  * samples whose learned offset leaves the band window (|dy| or |dx|
    beyond ~7 px; rare in trained models - offsets are zero-init) are
    computed exactly by the XLA gather path for up to `overflow_bucket`
    samples and scattered into the samples tensor before the weight
    matmul, so results match ops/dcn.py exactly.

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

RB = 8    # output rows per grid step
SW = 8    # output cols per segment


def _kernel(x_ref, sy_ref, sx_ref, m_ref, out_ref, band, sem, *,
            nsg: int, nb: int, bh: int, ww: int, stride: int, h_in: int,
            wp_in: int):
    """Grid (V*NB,).  x_ref: [V, Hp, Wp, C] (ANY); sy/sx/m: [1, NSg, 64, 9]
    VMEM blocks (band/window-relative clipped coords, folded masks);
    out_ref: [1, 9, NSg*64, C]; band: [BH, Wp, C] scratch."""
    i = pl.program_id(0)
    C = band.shape[-1]
    v = i // nb
    rb = i % nb
    y0 = jnp.clip(rb * RB * stride - 8, 0, max(h_in - bh, 0))

    pltpu.make_async_copy(
        x_ref.at[v, pl.ds(y0, bh)], band, sem).start()

    cell_y = jax.lax.broadcasted_iota(jnp.int32, (RB * SW, bh),
                                      1).astype(jnp.float32)
    cell_x = jax.lax.broadcasted_iota(jnp.int32, (RB * SW, ww),
                                      1).astype(jnp.float32)

    pltpu.make_async_copy(x_ref.at[v, pl.ds(y0, bh)], band, sem).wait()

    for s in range(nsg):
        xw0 = min(max(s * SW * stride - 8, 0), max(wp_in - ww, 0))
        ays, axs = [], []
        for k in range(9):
            ys = sy_ref[0, s, :, k:k + 1]                  # [64, 1]
            xs = sx_ref[0, s, :, k:k + 1]
            mk = m_ref[0, s, :, k:k + 1]
            ays.append(jnp.maximum(1.0 - jnp.abs(ys - cell_y), 0.0))
            axs.append(jnp.maximum(1.0 - jnp.abs(xs - cell_x), 0.0) * mk)
        ay = jnp.stack(ays).reshape(9 * RB * SW, bh)
        ax = jnp.stack(axs).reshape(9 * RB * SW, ww)

        seg = band[:, xw0:xw0 + ww, :].reshape(bh, ww * C)
        t = jax.lax.dot_general(
            ay.astype(band.dtype), seg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [576, WW*C]
        t3 = t.reshape(9 * RB * SW, ww, C)
        smp = (ax[:, :, None] * t3).sum(axis=1)            # [576, C]
        out_ref[0, :, s * RB * SW:(s + 1) * RB * SW, :] = (
            smp.reshape(9, RB * SW, C).astype(out_ref.dtype))


def _run_kernel(x: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                m: jnp.ndarray, stride: int, bh: int, ww: int,
                interpret: bool) -> jnp.ndarray:
    """x: [V, Hp, Wp, C]; sy/sx/m: [V*NB, NSg, 64, 9] -> [V*NB, 9, NSg*64, C]."""
    V, Hp, Wp, C = x.shape
    G, nsg = sy.shape[0], sy.shape[1]
    out = pl.pallas_call(
        functools.partial(_kernel, nsg=nsg, nb=G // V, bh=bh, ww=ww,
                          stride=stride, h_in=Hp, wp_in=Wp),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, nsg, RB * SW, 9), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, nsg, RB * SW, 9), lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, nsg, RB * SW, 9), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 9, nsg * RB * SW, C),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, 9, nsg * RB * SW, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((bh, Wp, C), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, sy, sx, m)
    return out


@functools.lru_cache(maxsize=None)
def _make_apply(stride, overflow_bucket, interpret):
    @jax.custom_jvp
    def f(x, sy, sx, m):
        return _apply_impl(x, sy, sx, m, stride, overflow_bucket, interpret)

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
    return _make_apply(stride, overflow_bucket, interpret)(x, sy, sx, m)


def _apply_impl(x, sy, sx, m, stride, overflow_bucket, interpret):
    V, H, W, C = x.shape
    Ho, Wo = sy.shape[1], sy.shape[2]
    # band geometry (8-aligned origins; margins give ~±7px offset coverage)
    Hp = -(-H // 8) * 8
    Wp = -(-W // 8) * 8
    bh = min(RB * stride + 16, Hp)
    ww = min(SW * stride + 16, Wp)
    nb = max(Ho // RB, 1)
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

    def pack(a):   # [V, Hop, Wop, 9] -> [V*NB, NSg, RB*SW, 9]
        a = a.reshape(V, nb, RB, nsg, SW, 9)
        a = a.transpose(0, 1, 3, 2, 4, 5)
        return a.reshape(V * nb, nsg, RB * SW, 9)

    samples = _run_kernel(xp, pack(ys_rel.astype(jnp.float32)),
                          pack(xs_rel.astype(jnp.float32)),
                          pack(meff.astype(jnp.float32)),
                          stride, bh, ww, interpret)
    # [V*NB, 9, NSg*64, C] -> [V, Ho, Wo, 9, C]
    samples = samples.reshape(V, nb, 9, nsg, RB, SW, C)
    samples = samples.transpose(0, 1, 4, 3, 5, 2, 6)
    samples = samples.reshape(V, Hop, Wop, 9, C)[:, :Ho, :Wo]

    if overflow_bucket > 0:
        over = (inside & ~inband & pix_valid[None, :, :, None] &
                (mp != 0.0))[:, :Ho, :Wo]
        P = V * Ho * Wo * 9
        K = min(overflow_bucket, P)
        flat_over = over.reshape(P)
        sel = jnp.argsort(~flat_over, stable=True)[:K]
        vi = (sel // (Ho * Wo * 9)).astype(jnp.int32)
        from .roi_align import _bilinear_gather
        vals = _bilinear_gather(
            x, vi, sxp[:, :Ho, :Wo].reshape(P)[sel][:, None],
            syp[:, :Ho, :Wo].reshape(P)[sel][:, None])[:, 0]
        vals = vals * (mp[:, :Ho, :Wo].reshape(P)[sel]
                       * flat_over[sel])[:, None]
        flat = samples.reshape(P, C)
        flat = flat.at[sel].add(vals.astype(flat.dtype))
        samples = flat.reshape(V, Ho, Wo, 9, C)
    return samples.reshape(V, Ho, Wo, 9 * C)
