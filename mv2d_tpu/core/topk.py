"""Top-k selection tuned for the TPU backend.

`jax.lax.top_k` inside the full compiled program can pick up XLA's
chunked-sort TopK expansion on TPU (measured in the eval device profile:
the RPN p2 top-1000 over [12, 135168] bf16 lowers to a [12, 128000]
key-value sort costing ~2 ms/step, while the same op standalone compiles
to the fast PartialReduce path at 0.04 ms).  `fast_topk` sidesteps the
pattern-matched rewrite by emitting `lax.approx_max_k`, which lowers to
the PartialReduce custom call DIRECTLY.

approx=True trades exactness for the guaranteed fast path: measured
recall vs exact top-k is ~0.99 at the RPN shape (target 0.95) and the
misses are score-tail ties; the reference's own pre-NMS top-k
(mmdet nms_pre, RPN test cfg maskrcnn_r50.py:77-109) feeds NMS, so
borderline candidates rarely change kept detections.  Exactness is
restored globally with MV2D_EXACT_TOPK=1 (parity/golden runs).  On
non-TPU backends approx_max_k falls back to the exact sort-based
lowering, so CPU tests always compare exactly.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def fast_topk(x: jnp.ndarray, k: int, approx: bool = True):
    """(values, indices) of the top k along the last axis, descending.

    approx=True uses the TPU PartialReduce lowering (recall ~0.99,
    exact on non-TPU backends); approx=False or MV2D_EXACT_TOPK=1 uses
    exact lax.top_k ('' / '0' leave the fast path on).
    """
    if not approx or os.environ.get('MV2D_EXACT_TOPK', '') not in ('', '0'):
        return jax.lax.top_k(x, k)
    if k >= x.shape[-1]:
        return jax.lax.top_k(x, k)
    if jax.default_backend() != 'tpu':
        # exact off-TPU: approx_max_k's CPU fallback breaks lax.top_k's
        # lowest-index tie-break, which golden/oracle tests rely on
        return jax.lax.top_k(x, k)
    return jax.lax.approx_max_k(x, k, recall_target=0.95,
                                aggregate_to_topk=True)


def topk_small_exact(x: jnp.ndarray, k: int):
    """EXACT top-k over a small last axis via k argmax+mask iterations.

    In-net `lax.top_k` on the correlation's [900, 12, 75] k=20 operand
    lowers to a ~2 ms sort on TPU; k passes of dense (max, argmax, mask)
    VPU work cost ~0.3 ms at that shape.  Identical results to
    lax.top_k including the lowest-index tie-break (argmax returns the
    first maximum; repeated extraction yields ties in ascending index
    order).  Routed on TPU only - XLA sorts are fine on CPU and the
    scan just adds trace size there.
    """
    n = x.shape[-1]
    if k >= n or jax.default_backend() != 'tpu':
        return jax.lax.top_k(x, k)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    neg = jnp.asarray(-jnp.inf, x.dtype)

    def step(carry, _):
        i = jnp.argmax(carry, axis=-1)
        v = jnp.max(carry, axis=-1)
        carry = jnp.where(iota == i[..., None], neg, carry)
        return carry, (v, i.astype(jnp.int32))

    _, (vals, idxs) = jax.lax.scan(step, x, None, length=k)
    # scan stacks on axis 0: [k, ...] -> [..., k]
    return (jnp.moveaxis(vals, 0, -1), jnp.moveaxis(idxs, 0, -1))
