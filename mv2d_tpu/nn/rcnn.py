"""Second-stage R-CNN box head (Shared2FCBBoxHead) + detection decoding.

Replaces mmdet Shared2FCBBoxHead as configured by the reference 2D detector
(ref: configs/mv2d/detectors/maskrcnn_r50.py:43-56): two shared 1024-d FCs on
7x7x256 RoI features, softmax classification over 10 classes + background,
class-specific box deltas with stds (0.1, 0.1, 0.2, 0.2).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .rpn import delta2bbox


class _FlatDense(nn.Module):
    """Dense over a flattened [R, H, W, C] input WITHOUT the explicit
    reshape: x.reshape(R, -1) before the fc1 matmul forced XLA to
    materialize a ~300 MB relayout copy of the full RoI-feature tensor
    (est. ~4 ms/step in the eval HLO); a dot_general contracting
    (H, W, C) directly lets the matmul read the producer's layout.
    Parameters keep nn.Dense's {kernel [H*W*C, F], bias [F]} tree, so
    torch-checkpoint conversion is unchanged (row-major h, w, c flatten
    order matches the kernel reshape exactly)."""
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W, C = x.shape[1:]
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (H * W * C, self.features))
        b = self.param('bias', nn.initializers.zeros, (self.features,))
        y = jax.lax.dot_general(
            x, k.reshape(H, W, C, self.features).astype(x.dtype),
            (((1, 2, 3), (0, 1, 2)), ((), ())))
        return y + b.astype(y.dtype)


class Shared2FCBBoxHead(nn.Module):
    num_classes: int = 10
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        """roi_feats: [R, 7, 7, C] -> (cls_logits [R, K+1], deltas [R, K*4])."""
        x = _FlatDense(self.fc_out_channels, name='shared_fc1')(roi_feats)
        x = nn.relu(x)
        x = nn.relu(nn.Dense(self.fc_out_channels, name='shared_fc2')(x))
        cls_logits = nn.Dense(self.num_classes + 1, name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        deltas = nn.Dense(reg_dim, name='fc_reg')(x)
        return cls_logits, deltas


def decode_detections(proposals: jnp.ndarray, cls_logits: jnp.ndarray,
                      deltas: jnp.ndarray, image_shape: Tuple[int, int],
                      num_classes: int = 10
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class decoding of R-CNN outputs (one view).

    proposals: [R, 4], cls_logits: [R, K+1], deltas: [R, K*4].
    Returns (boxes [R, K, 4], scores [R, K]) - background column dropped,
    class-specific boxes decoded with the mmdet target stds.
    """
    scores = jax.nn.softmax(cls_logits, axis=-1)[:, :num_classes]
    d = deltas.reshape(-1, num_classes, 4)
    boxes = delta2bbox(proposals[:, None, :], d, max_shape=image_shape,
                       stds=(0.1, 0.1, 0.2, 0.2))
    return boxes, scores
