"""RetinaNet-style single-stage detection head.

The reference registers `SingleStageDetBase` (ref:
models/detectors/wrap_detector.py:7-33), a wrapper that lets MV2D run on any
mmdet single-stage detector (the shipped recipes use the two-stage
Faster/Mask R-CNN).  This is the TPU-native single-stage family: a shared
conv-tower anchor head (mmdet RetinaHead semantics: 4-layer cls/reg towers,
A = scales_per_octave x ratios anchors, focal-prior cls bias) evaluated on
the shared FPN levels, decoding into the same fixed-shape `Proposals`
interface the 3D head consumes.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.nms import multiclass_nms_2d
from .rpn import delta2bbox, grid_anchors


def retina_scales(octave_base_scale: float = 4.0,
                  scales_per_octave: int = 3) -> Tuple[float, ...]:
    """mmdet RetinaNet anchor scales: base * 2^(i/n)."""
    return tuple(octave_base_scale * 2 ** (i / scales_per_octave)
                 for i in range(scales_per_octave))


class RetinaHead(nn.Module):
    """4-conv cls/reg towers shared across levels; focal-prior bias init."""
    num_classes: int = 10
    num_anchors: int = 9               # 3 scales x 3 ratios
    feat_channels: int = 256
    stacked_convs: int = 4
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_tower = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, name=f'cls_conv{i}')
                     for i in range(self.stacked_convs)]
        reg_tower = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1)] * 2, name=f'reg_conv{i}')
                     for i in range(self.stacked_convs)]
        bias = float(-np.log((1 - self.prior_prob) / self.prior_prob))
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=[(1, 1)] * 2,
                          bias_init=nn.initializers.constant(bias),
                          name='retina_cls')
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3),
                          padding=[(1, 1)] * 2, name='retina_reg')
        scores, deltas = [], []
        for f in feats:
            c = r = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            for conv in reg_tower:
                r = nn.relu(conv(r))
            scores.append(cls_out(c))          # [V, H, W, A*K]
            deltas.append(reg_out(r))          # [V, H, W, A*4]
        return scores, deltas


def single_stage_detections(scores: List[jnp.ndarray],
                            deltas: List[jnp.ndarray],
                            strides: Sequence[int],
                            image_shape: Tuple[int, int],
                            num_classes: int,
                            score_thr: float = 0.05,
                            nms_pre: int = 1000,
                            iou_threshold: float = 0.6,
                            max_per_img: int = 75,
                            min_bbox_size: float = 0.0,
                            scales=retina_scales(),
                            ratios=(0.5, 1.0, 2.0)):
    """Anchor-head decode -> per-view padded multiclass detections.

    scores[l]: [V, H, W, A*K] logits; deltas[l]: [V, H, W, A*4].
    Per level: top nms_pre anchors by max-class score -> delta decode ->
    class-wise NMS over the level union (mmdet GeneralizedAnchorHead
    get_bboxes semantics with static shapes).
    Returns (boxes [V, P, 4], scores [V, P], labels [V, P], valid [V, P]).
    """
    V = scores[0].shape[0]
    K = num_classes
    lvl_boxes, lvl_scores = [], []
    for l, (s, d) in enumerate(zip(scores, deltas)):
        H, W = s.shape[1], s.shape[2]
        anchors = jnp.asarray(grid_anchors((H, W), strides[l],
                                           scales, ratios))
        s = s.reshape(V, H * W, -1, K).reshape(V, -1, K)     # [V, HWA, K]
        d = d.reshape(V, H * W, -1, 4).reshape(V, -1, 4)
        n_pre = min(nms_pre, s.shape[1])
        best = s.max(-1)                                     # [V, HWA]
        _, top_i = jax.lax.top_k(best, n_pre)
        top_anchor = anchors[top_i]
        top_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        top_s = jnp.take_along_axis(s, top_i[..., None], axis=1)
        boxes = delta2bbox(top_anchor, top_d, max_shape=image_shape)
        lvl_boxes.append(boxes)
        lvl_scores.append(top_s)
    all_boxes = jnp.concatenate(lvl_boxes, axis=1)           # [V, N, 4]
    all_scores = jax.nn.sigmoid(jnp.concatenate(lvl_scores, axis=1))
    wh = all_boxes[..., 2:4] - all_boxes[..., 0:2]
    valid = jnp.all(wh > min_bbox_size, axis=-1)

    def per_view(b, s, v):
        # anchor heads share one box across classes (class-agnostic
        # regression): broadcast to the [R, C, 4] multiclass layout
        bc = jnp.broadcast_to(b[:, None, :], (b.shape[0], K, 4))
        return multiclass_nms_2d(bc, s, v, score_thr, iou_threshold,
                                 nms_pre, max_per_img,
                                 min_bbox_size=min_bbox_size)

    return jax.vmap(per_view)(all_boxes, all_scores, valid)
