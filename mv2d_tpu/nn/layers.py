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

    def setup(self):
        self.scale = self.param('scale', nn.initializers.ones,
                                (self.features,))
        self.offset = self.param('bias', nn.initializers.zeros,
                                 (self.features,))
        self.mean = self.variable('constants', 'mean',
                                  lambda: jnp.zeros((self.features,)))
        self.var = self.variable('constants', 'var',
                                 lambda: jnp.ones((self.features,)))

    def fold(self):
        """(s, b) with BN(x) == x*s + b - the affine is constant (stats
        frozen, params excluded from optimization), so it can be folded
        into a preceding conv's weights exactly."""
        s = self.scale / jnp.sqrt(self.var.value + self.eps)
        return s, self.offset - self.mean.value * s

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s, b = self.fold()
        return x * s.astype(x.dtype) + b.astype(x.dtype)
