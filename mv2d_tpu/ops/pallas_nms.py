"""Greedy NMS suppression as a single Pallas kernel.

The lax.scan formulation in core/nms.py issues ~N sequential XLA ops (64-way
unrolled block chains); at RPN scale (4544 candidates x 12 views) the
dispatch overhead alone costs ~65 ms.  This kernel runs the exact greedy
scan fully on-core: boxes and the keep vector live in VMEM, each iteration
is a handful of VPU ops over the [1, N] lane vector (~1-2 ms total).

Boxes must already be sorted by descending score (with invalid rows pushed
to the end), exactly as core/nms.nms_padded prepares them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(boxes_ref, valid_ref, keep_ref, *, n: int, thr: float,
            eps: float = 1e-4):
    # boxes_ref: [1, N, 4]; valid_ref/keep_ref: [1, N] float32 (1/0)
    x1 = boxes_ref[0, :, 0][None]           # [1, N]
    y1 = boxes_ref[0, :, 1][None]
    x2 = boxes_ref[0, :, 2][None]
    y2 = boxes_ref[0, :, 3][None]
    area = (x2 - x1) * (y2 - y1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, x1.shape[1]), 1)

    def body(i, keep):
        bx1 = boxes_ref[0, i, 0]
        by1 = boxes_ref[0, i, 1]
        bx2 = boxes_ref[0, i, 2]
        by2 = boxes_ref[0, i, 3]
        barea = (bx2 - bx1) * (by2 - by1)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter + eps)
        later = col > i
        sup = jnp.where((iou > thr) & later, 0.0, 1.0)
        kept_i = jnp.sum(jnp.where(col == i, keep, 0.0)) > 0.0
        return jnp.where(kept_i, keep * sup, keep)

    keep = jax.lax.fori_loop(0, n, body, valid_ref[:])
    keep_ref[:] = keep


def pallas_greedy_nms(boxes: jnp.ndarray, valid: jnp.ndarray,
                      iou_threshold: float,
                      interpret: bool | None = None) -> jnp.ndarray:
    """boxes: [N, 4] score-sorted; valid: [N] bool -> keep [N] bool."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    n = boxes.shape[0]
    N = -(-n // 128) * 128
    b = jnp.pad(boxes.astype(jnp.float32), ((0, N - n), (0, 0)))
    v = jnp.pad(valid.astype(jnp.float32), (0, N - n))
    keep = pl.pallas_call(
        functools.partial(_kernel, n=n, thr=float(iou_threshold)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        interpret=interpret,
    )(b[None], v[None])
    return keep[0, :n] > 0.5
