"""Shared NN building blocks (flax.linen, channels-last)."""
from __future__ import annotations


import os

import jax
import jax.numpy as jnp
from flax import linen as nn


def max_pool_3x3_s2(x: jnp.ndarray,
                    fast_inference: bool = False) -> jnp.ndarray:
    """3x3 stride-2 pad-1 max pool, exactly
    nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)]*2).

    Lowering is PATH-dependent (A/B in docs/PERF.md round 4):
      * inference: XLA reduce-window (1.6 ms on the stem map; the
        separable form's pad/strided-slice fusions cost ~6.5 ms under the
        s2d-input layout regime),
      * training: two 1-D slice-max passes - reduce-window's backward is
        a SelectAndScatter, while the slice-max form differentiates into
        cheap elementwise selects (train step 317.6 -> ~296 ms/scene).
    MV2D_MAXPOOL=rw|sep forces one lowering for A/B.
    """
    mode = os.environ.get('MV2D_MAXPOOL')
    use_rw = fast_inference if mode not in ('rw', 'sep') else mode == 'rw'
    if not use_rw:
        V, H, W, C = x.shape
        neg = jnp.finfo(x.dtype).min
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=neg)
        Ho, Wo = (H + 1) // 2, (W + 1) // 2
        r = [xp[:, i:i + 2 * Ho:2] for i in range(3)]
        h = jnp.maximum(jnp.maximum(r[0], r[1]), r[2])
        c = [h[:, :, j:j + 2 * Wo:2] for j in range(3)]
        return jnp.maximum(jnp.maximum(c[0], c[1]), c[2])
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=[(1, 1), (1, 1)])


def conv1x1_dot(x: jnp.ndarray, kernel: jnp.ndarray, bias=None,
                stride: int = 1) -> jnp.ndarray:
    """1x1 conv as reshape + matmul.

    XLA's conv lowering runs small-C 1x1 convs at <10% MXU on v5e (layer1
    conv3 measured 1.35 ms vs a 0.43 ms bandwidth floor); the explicit dot
    form measured ~1 ms faster standalone (tools/conv_experiments.py).
    kernel is [1, 1, C, O] (nn.Conv layout) or [C, O]."""
    if stride != 1:
        x = x[:, ::stride, ::stride, :]
    c = x.shape[-1]
    w = kernel.reshape(c, -1).astype(x.dtype)
    y = jax.lax.dot_general(x.reshape(-1, c), w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y.astype(x.dtype).reshape(*x.shape[:-1], w.shape[-1])
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class Conv1x1(nn.Module):
    """Drop-in for nn.Conv(features, (1, 1)): same param tree (kernel
    [1, 1, C, O] + bias [O]), dot-form compute (see conv1x1_dot)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (1, 1, x.shape[-1], self.features))
        b = (self.param('bias', nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return conv1x1_dot(x, k, b)


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
