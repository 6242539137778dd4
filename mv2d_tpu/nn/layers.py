"""Shared NN building blocks (flax.linen, channels-last)."""
from __future__ import annotations

from typing import Callable, Optional

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


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride,
                    padding=[(self.kernel // 2,) * 2] * 2, use_bias=False)(x)
        x = FrozenBatchNorm(self.features)(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Stack of Linear(+activation) layers."""
    features: tuple
    activate_final: bool = False
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = self.activation(x)
        return x
