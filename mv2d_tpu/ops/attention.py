"""Masked multi-head attention for the sparse MV2D decoder.

Replaces torch nn.MultiheadAttention (ref: models/utils/petr_transformer.py:
358-363, 417) including the two MV2D-specific usages:
  * global self-attention over ALL queries folded into one sequence
    (FlattenMHSelfAttention, petr_transformer.py:346-351) with the DN
    block-diagonal mask,
  * cross-attention with a PER-QUERY boolean key mask (the epipolar
    correlation sparsity, cross_attention_head.py:33-45).

Masks here are "allowed" masks (True = may attend), the opposite of the torch
attn_mask convention.  Fully-masked query rows produce a ZERO attention
output (the reference instead flips one fake key on for such rows,
mv2d_head.py:157-159 - equivalent up to the value of dead queries).

The einsum formulation fuses cleanly in XLA and feeds the MXU; a Pallas
flash-attention kernel with block-sparse mask skipping can be slotted in
behind the same signature (see mv2d_tpu/ops/pallas_attention.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e9  # additive mask value; large but safe in bf16/f32 softmax


def masked_softmax(logits: jnp.ndarray, allowed: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis; rows with no allowed entries return zeros."""
    logits = jnp.where(allowed, logits, _NEG)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m) * allowed.astype(logits.dtype)
    denom = e.sum(-1, keepdims=True)
    return e / jnp.maximum(denom, 1e-20)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         num_heads: int, allowed: jnp.ndarray | None = None,
                         ) -> jnp.ndarray:
    """Batched MHA on already-projected q/k/v.

    q: [B, Q, C], k/v: [B, K, C], allowed: broadcastable to [B, Q, K] or None.
    Returns [B, Q, C] (pre output-projection).
    """
    B, Q, C = q.shape
    K = k.shape[1]
    H = num_heads
    D = C // H
    qh = q.reshape(B, Q, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, K, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, K, H, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(D, dtype=logits.dtype))
    if allowed is not None:
        attn = masked_softmax(logits, jnp.broadcast_to(
            allowed[:, None] if allowed.ndim == 3 else allowed,
            logits.shape))
    else:
        attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, Q, C).astype(q.dtype)
