"""Masked flash attention as a Pallas TPU kernel.

The MV2D decoder's cross attention has a PER-QUERY boolean key mask (the
epipolar correlation sparsity, ref cross_attention_head.py:33-45).  The XLA
path (ops/attention.py) materializes [H, Q, K] logits in HBM (~1 GB per layer
at full size); this kernel keeps logits in VMEM.

Layout: grid (Q/BQ,) with ALL heads folded into one step.  The K/V panels
[H, K, D] live in VMEM for the whole kernel (16 MB at K_MAX=16384, C=256
bf16) and their BlockSpec index is constant, so they are DMA'd exactly once;
the [BQ, K] mask block is read once per q-block and shared by all heads.
(The earlier grid-(H, Q/BQ) form re-read the mask once per head: ~250 MB of
avoidable HBM traffic per layer at 960 queries.)  Head-size K/V panels are
small enough that no online-softmax key blocking is needed - each head's
[BQ, K] logits are a VMEM transient.

Fully-masked query rows produce zeros (matching ops.attention.masked_softmax
semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, heads: int,
            scale: float):
    # q_ref: [H, BQ, D]; k_ref/v_ref: [H, K, D]; mask_ref: [BQ, K] bf16 0/1
    # (int8 vector compares are unsupported on v5e Mosaic); o_ref: [H, BQ, D]
    msk = mask_ref[:].astype(jnp.float32)            # [BQ, K]
    bias = (msk - 1.0) * (-_NEG)                     # 0 where on, -1e9 off
    for h in range(heads):
        q = q_ref[h].astype(jnp.float32) * scale     # [BQ, D]
        k = k_ref[h].astype(jnp.float32)             # [K, D]
        v = v_ref[h].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [BQ, K]
        logits = logits * msk + bias
        m = logits.max(-1, keepdims=True)
        p = jnp.exp(logits - m) * msk
        l = p.sum(-1, keepdims=True)
        out = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[h] = (out / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def masked_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           allowed: jnp.ndarray, num_heads: int,
                           block_q: int = 64, block_k: int = 1024,
                           interpret: bool | None = None) -> jnp.ndarray:
    """q: [Q, C]; k, v: [K, C]; allowed: [Q, K] bool -> [Q, C].

    Pads Q and K to block multiples; padded keys are masked out, padded
    queries discarded.  block_k is accepted for call compatibility (key
    blocking is no longer needed - logits stay VMEM-resident per head).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    Q, C = q.shape
    K = k.shape[0]
    H = num_heads
    D = C // H
    BQ = min(block_q, max(8, Q))
    Qp = -(-Q // BQ) * BQ
    Kp = -(-K // 128) * 128
    qh = jnp.pad(q, ((0, Qp - Q), (0, 0))).reshape(Qp, H, D)
    qh = qh.transpose(1, 0, 2)                                  # [H, Qp, D]
    kh = jnp.pad(k, ((0, Kp - K), (0, 0))).reshape(Kp, H, D).transpose(1, 0, 2)
    vh = jnp.pad(v, ((0, Kp - K), (0, 0))).reshape(Kp, H, D).transpose(1, 0, 2)
    msk = jnp.pad(allowed.astype(jnp.bfloat16), ((0, Qp - Q), (0, Kp - K)))

    out = pl.pallas_call(
        functools.partial(_kernel, heads=H, scale=1.0 / (D ** 0.5)),
        grid=(Qp // BQ,),
        in_specs=[
            pl.BlockSpec((H, BQ, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Kp, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Kp, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, BQ, D), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Qp, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qh, kh, vh, msk)
    return out.transpose(1, 0, 2).reshape(Qp, C)[:Q]
