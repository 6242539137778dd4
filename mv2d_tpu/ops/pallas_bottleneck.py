"""Fused ResNet bottleneck (1x1 -> 3x3 -> 1x1 + residual) Pallas kernel.

The XLA path materializes every intermediate of a bottleneck block in HBM
(conv1 out, conv2 out, conv3 out, residual sum); for the backbone's stride-4
stage that is ~1 GB of HBM traffic per block at 12 views x 512x1408.  This
kernel keeps the whole block VMEM-resident: one halo'd input band
[BH+3, Wt, C] is DMA'd per (view, row-block) grid step and only
relu(residual + conv3) is written back.

Layout is the key: the bottleneck channels P live on SUBLANES and the
flattened band pixels on LANES (t1 [P, (BH+3)*Wt]), so the nine 3x3 taps
are LANE slices at offset dy*Wt+dx of the per-tap matmul result - cheap
lane rotations instead of the full-array relayouts that sank the
channels-last formulation (docs/PERF.md).  Row-wrap garbage lands only in
the 8 padded columns, which the caller slices off.

Inference-only (zero-tangent custom_jvp): the backbone trains through the
plain XLA convs (ref backbone: mmdet ResNet built from
configs/mv2d/detectors/maskrcnn_r50.py:5-14; this fuses the stride-1
identity bottlenecks = all blocks except each stage's first).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 16   # output rows per grid step


def _kernel(x_ref, w1_ref, b1_ref, w2t_ref, b2_ref, w3_ref, b3_ref,
            out_ref, band, sem, *, wt: int, c: int, p: int):
    """Grid (V, NB).  x_ref: [V, Hp+3, Wt, C] in ANY (zero ring: 1 top/left,
    >=2 bottom, >=1 right; Wt 8-aligned); w1_ref: [C, P];
    w2t_ref: [9*P, P] tap-major TRANSPOSED blocks (block t = W2[t].T, i.e.
    [P_out, P_in]); w3_ref: [P, C]; out: [1, BH, Wt, C];
    band: [BH+3, Wt, C] halo'd input rows starting at padded row rb*BH."""
    v = pl.program_id(0)
    rb = pl.program_id(1)
    n = BH * wt
    na = (BH + 3) * wt

    cp = pltpu.make_async_copy(x_ref.at[v, pl.ds(rb * BH, BH + 3)], band,
                               sem)
    cp.start()
    cp.wait()

    bvf = band[:].reshape(na, c)
    # conv1 (1x1), channels-first result: t1[p, j] = sum_c W1[c,p] bvf[j,c]
    t1 = jax.lax.dot_general(w1_ref[:], bvf, (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [P, na]
    t1 = jnp.maximum(t1 + b1_ref[:, :1], 0.0).astype(bvf.dtype)

    # conv2 (3x3): acc[po, j] = sum_t (W2[t].T @ t1)[po, j + dy*Wt + dx]
    # (out lane j = y*Wt + x maps to band pixel (y+1, x+1))
    acc = jnp.zeros((p, n), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            u = jax.lax.dot_general(
                w2t_ref[pl.ds((dy * 3 + dx) * p, p), :], t1,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [P, na]
            s = dy * wt + dx
            acc = acc + jax.lax.slice(u, (0, s), (p, s + n))
    t2 = jnp.maximum(acc + b2_ref[:, :1], 0.0).astype(bvf.dtype)

    # conv3 (1x1) back to channels-last + residual + relu
    t3 = jax.lax.dot_general(t2, w3_ref[:], (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [n, C]
    res = jax.lax.slice(bvf, (wt + 1, 0), (wt + 1 + n, c))
    y = jnp.maximum(t3 + b3_ref[:1, :] + res.astype(jnp.float32), 0.0)
    out_ref[0] = y.reshape(BH, wt, c).astype(out_ref.dtype)


def _run(xp: jnp.ndarray, w1, b1, w2t, b2, w3, b3, interpret: bool):
    V, Hp3, Wt, C = xp.shape
    H = Hp3 - 3
    P = w1.shape[1]
    nb = H // BH
    out = pl.pallas_call(
        functools.partial(_kernel, wt=Wt, c=C, p=P),
        grid=(V, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((C, P), lambda v, r: (0, 0)),
                  pl.BlockSpec((P, 1), lambda v, r: (0, 0)),
                  pl.BlockSpec((9 * P, P), lambda v, r: (0, 0)),
                  pl.BlockSpec((P, 1), lambda v, r: (0, 0)),
                  pl.BlockSpec((P, C), lambda v, r: (0, 0)),
                  pl.BlockSpec((1, C), lambda v, r: (0, 0))],
        out_specs=pl.BlockSpec((1, BH, Wt, C), lambda v, r: (v, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((V, H, Wt, C), xp.dtype),
        scratch_shapes=[pltpu.VMEM((BH + 3, Wt, C), xp.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(xp, w1, b1, w2t, b2, w3, b3)
    return out


@functools.lru_cache(maxsize=None)
def _make_apply(interpret):
    @jax.custom_jvp
    def f(xp, w1, b1, w2t, b2, w3, b3):
        return _run(xp, w1, b1, w2t, b2, w3, b3, interpret)

    @f.defjvp
    def _jvp(primals, tangents):
        out = f(*primals)
        return out, jnp.zeros_like(out)

    return f


def fused_bottleneck(x: jnp.ndarray, w1, b1, w2, b2, w3, b3,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Identity bottleneck y = relu(x + f3(relu(f2(relu(f1(x)))))).

    x: [V, H, W, C]; w1: [C, P], w2: [9*P, P] (rows tap-major, tap =
    dy*3 + dx, each block [P_in, P_out]), w3: [P, C]; b*: f32 biases with
    frozen-BN affines already folded in.  Inference only (zero tangents).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    V, H, W, C = x.shape
    P = w1.shape[1]
    # rows: 1 top ring + content padded to a BH multiple + 2 halo slack;
    # cols: 1 left ring + content + right pad to Wt = 8-aligned W + 8
    Hp = -(-H // BH) * BH
    Wt = -(-W // 8) * 8 + 8
    xp = jnp.pad(x, ((0, 0), (1, 2 + Hp - H), (1, Wt - W - 1), (0, 0)))
    w2t = w2.reshape(9, P, P).transpose(0, 2, 1).reshape(9 * P, P)
    b1 = b1.reshape(P, 1).astype(jnp.float32)
    b2 = b2.reshape(P, 1).astype(jnp.float32)
    b3 = b3.reshape(1, C).astype(jnp.float32)
    out = _make_apply(interpret)(xp, w1.astype(x.dtype), b1,
                                 w2t.astype(x.dtype), b2,
                                 w3.astype(x.dtype), b3)
    return out[:, :H, :W]
