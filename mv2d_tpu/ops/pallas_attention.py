"""Masked flash attention as a Pallas TPU kernel.

The MV2D decoder's cross attention has a PER-QUERY boolean key mask (the
epipolar correlation sparsity, ref cross_attention_head.py:33-45).  The XLA
path (ops/attention.py) materializes [H, Q, K] logits in HBM (~1 GB per layer
at full size); this kernel streams K in blocks with online softmax so logits
never leave VMEM.

Layout: grid (heads, Q/BQ); per step the full per-head K/V panels live in
VMEM (K_MAX=16384 x D=32 bf16 = 1 MB) and the kernel loops over BK-sized key
blocks.  Fully-masked query rows produce zeros (matching
ops.attention.masked_softmax semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, bk: int, scale: float):
    # q_ref: [1, BQ, D]; k_ref/v_ref: [1, K, D]; mask_ref: [BQ, K] bf16 0/1
    # (int8 vector compares are unsupported on v5e Mosaic)
    # o_ref: [1, BQ, D]
    q = q_ref[0].astype(jnp.float32) * scale         # [BQ, D]
    BQ, D = q.shape
    K = k_ref.shape[1]
    nblk = K // bk

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)   # [BK, D]
        v = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        # mask arithmetic instead of vector compares (unsupported on the
        # target for sub-f32 dtypes): msk is 1.0/0.0
        msk = mask_ref[:, pl.ds(i * bk, bk)].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # [BQ, BK]
        logits = logits * msk + (msk - 1.0) * (-_NEG)
        m_new = jnp.maximum(m, logits.max(-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new) * msk
        l_new = l * alpha + p.sum(-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((BQ, D), jnp.float32)
    m0 = jnp.full((BQ, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nblk, body, (acc0, m0, l0))
    out = acc / jnp.maximum(l, 1e-20)
    o_ref[0] = out.astype(o_ref.dtype)


def masked_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           allowed: jnp.ndarray, num_heads: int,
                           block_q: int = 64, block_k: int = 1024,
                           interpret: bool | None = None) -> jnp.ndarray:
    """q: [Q, C]; k, v: [K, C]; allowed: [Q, K] bool -> [Q, C].

    Pads Q and K to block multiples; padded keys are masked out, padded
    queries discarded.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    Q, C = q.shape
    K = k.shape[0]
    H = num_heads
    D = C // H
    BQ = min(block_q, max(8, Q))
    Qp = -(-Q // BQ) * BQ
    BK = min(block_k, K)
    Kp = -(-K // BK) * BK
    qh = jnp.pad(q, ((0, Qp - Q), (0, 0))).reshape(Qp, H, D)
    qh = qh.transpose(1, 0, 2)                                  # [H, Qp, D]
    kh = jnp.pad(k, ((0, Kp - K), (0, 0))).reshape(Kp, H, D).transpose(1, 0, 2)
    vh = jnp.pad(v, ((0, Kp - K), (0, 0))).reshape(Kp, H, D).transpose(1, 0, 2)
    msk = jnp.pad(allowed.astype(jnp.bfloat16), ((0, Qp - Q), (0, Kp - K)))

    grid = (H, Qp // BQ)
    out = pl.pallas_call(
        functools.partial(_kernel, bk=BK, scale=1.0 / (D ** 0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp, D), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp, D), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, Kp), lambda h, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda h, i: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Qp, D), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, msk)
    return out.transpose(1, 0, 2).reshape(Qp, C)[:Q]
