"""Sigmoid focal loss + weighted L1 (pure JAX).

Replaces the mmcv CUDA sigmoid_focal_loss (ref loss cfg:
configs/mv2d/exp/..._ep24.py:91-97; mmdet FocalLoss semantics) and mmdet
L1Loss with avg_factor reduction.

All helpers upcast their inputs to f32 INSIDE the loss body (the
reference's force_fp32 islands): the casts fuse into the loss loop,
so bf16 operands never get materialized as f32 copies in HBM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       weights: jnp.ndarray, num_classes: int,
                       alpha: float = 0.25, gamma: float = 2.0,
                       avg_factor: jnp.ndarray | float = 1.0,
                       loss_weight: float = 1.0) -> jnp.ndarray:
    """mmdet-compatible focal loss.

    logits: [N, C]; labels: [N] int in [0, C] where C == num_classes means
    background (all-zero one-hot target); weights: [N] per-sample weight.
    """
    logits = logits.astype(jnp.float32)
    targets = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    loss = loss.sum(-1) * weights
    return loss_weight * loss.sum() / jnp.maximum(avg_factor, 1.0)


def optax_sigmoid_ce(logits, targets):
    # numerically-stable BCE with logits
    return jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def weighted_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     weights: jnp.ndarray,
                     avg_factor: jnp.ndarray | float = 1.0,
                     loss_weight: float = 1.0) -> jnp.ndarray:
    """mmdet L1Loss with elementwise weights and avg_factor."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    loss = jnp.abs(pred - target) * weights.astype(jnp.float32)
    return loss_weight * loss.sum() / jnp.maximum(avg_factor, 1.0)


def binary_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                         weights: jnp.ndarray,
                         avg_factor: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    loss = optax_sigmoid_ce(logits.astype(jnp.float32),
                            targets.astype(jnp.float32))
    loss = loss * weights.astype(jnp.float32)
    return loss.sum() / jnp.maximum(avg_factor, 1.0)


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                          weights: jnp.ndarray,
                          avg_factor: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return (nll * weights).sum() / jnp.maximum(avg_factor, 1.0)
