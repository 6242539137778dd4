"""Shared NN building blocks (flax.linen, channels-last)."""
from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored statistics (eval mode).

    Matches the reference backbone setting norm_cfg=dict(type='BN',
    requires_grad=False) + norm_eval=True (ref: configs/mv2d/detectors/
    maskrcnn_r50.py:11-12): statistics are constants, affine params exist but
    are excluded from optimization by the paramwise rules in train/optim.py.
    Stats live in the 'constants' collection so they are loadable from
    converted torch checkpoints but never touched by optax.
    """
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param('scale', nn.initializers.ones, (self.features,))
        beta = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.variable('constants', 'mean',
                             lambda: jnp.zeros((self.features,)))
        var = self.variable('constants', 'var',
                            lambda: jnp.ones((self.features,)))
        inv = jnp.asarray(1.0, x.dtype) / jnp.sqrt(var.value + self.eps)
        inv = inv.astype(x.dtype)
        return (x - mean.value.astype(x.dtype)) * inv * gamma.astype(x.dtype) \
            + beta.astype(x.dtype)
