"""RPN head + anchor generation + fixed-shape proposal decoding.

Replaces mmdet RPNHead / AnchorGenerator / DeltaXYWHBBoxCoder as configured by
the reference 2D detector (ref: configs/mv2d/detectors/maskrcnn_r50.py:20-35,
test_cfg rpn at :100-104): scales [8], ratios [0.5, 1, 2], strides
[4, 8, 16, 32, 64], target means 0 / stds 1.

Proposal generation is the mmdet flow with static shapes: per-level top
nms_pre by score -> decode deltas -> clip -> (optional min size filter) ->
joint NMS -> fixed max_per_img slots + validity mask.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.nms import _NEG, nms_sorted_keep
from ..core.topk import fast_topk


def base_anchors(stride: int, scales=(8,), ratios=(0.5, 1.0, 2.0)
                 ) -> np.ndarray:
    """mmdet AnchorGenerator base anchors (center_offset=0)."""
    out = []
    for r in ratios:
        for s in scales:
            h = stride * s * np.sqrt(r)
            w = stride * s / np.sqrt(r)
            out.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.asarray(out, dtype=np.float32)


def grid_anchors(feat_shape: Tuple[int, int], stride: int,
                 scales=(8,), ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """All anchors for one level: [H*W*A, 4] (row-major over y, x, anchor)."""
    H, W = feat_shape
    base = base_anchors(stride, scales, ratios)          # [A, 4]
    xs = np.arange(W, dtype=np.float32) * stride
    ys = np.arange(H, dtype=np.float32) * stride
    shift_x, shift_y = np.meshgrid(xs, ys)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y], -1).reshape(-1, 4)
    return (shifts[:, None] + base[None]).reshape(-1, 4)


def delta2bbox(anchors: jnp.ndarray, deltas: jnp.ndarray,
               max_shape: Tuple[int, int] | None = None,
               means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
               wh_ratio_clip: float = 16.0 / 1000.0) -> jnp.ndarray:
    """mmdet DeltaXYWHBBoxCoder.decode. anchors/deltas: [..., 4]."""
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    pw = anchors[..., 2] - anchors[..., 0]
    ph = anchors[..., 3] - anchors[..., 1]
    px = (anchors[..., 0] + anchors[..., 2]) * 0.5
    py = (anchors[..., 1] + anchors[..., 3]) * 0.5
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    if max_shape is not None:
        h, w = max_shape
        x1 = jnp.clip(x1, 0, w); x2 = jnp.clip(x2, 0, w)
        y1 = jnp.clip(y1, 0, h); y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2delta(anchors: jnp.ndarray, gt: jnp.ndarray,
               means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.)) -> jnp.ndarray:
    """mmdet DeltaXYWHBBoxCoder.encode."""
    pw = anchors[..., 2] - anchors[..., 0]
    ph = anchors[..., 3] - anchors[..., 1]
    px = (anchors[..., 0] + anchors[..., 2]) * 0.5
    py = (anchors[..., 1] + anchors[..., 3]) * 0.5
    gw = jnp.clip(gt[..., 2] - gt[..., 0], 1e-6, None)
    gh = jnp.clip(gt[..., 3] - gt[..., 1], 1e-6, None)
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    d = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                   jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
    means = jnp.asarray(means, dtype=d.dtype)
    stds = jnp.asarray(stds, dtype=d.dtype)
    return (d - means) / stds


class RPNHead(nn.Module):
    """3x3 conv + relu, then 1x1 objectness (A) and 1x1 deltas (4A)."""
    num_anchors: int = 3
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                       name='rpn_conv')
        cls = nn.Conv(self.num_anchors, (1, 1), name='rpn_cls')
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name='rpn_reg')
        scores, deltas = [], []
        for f in feats:
            x = nn.relu(conv(f))
            scores.append(cls(x))
            deltas.append(reg(x))
        return scores, deltas


def rpn_proposals(scores: List[jnp.ndarray], deltas: List[jnp.ndarray],
                  strides: Sequence[int], image_shape: Tuple[int, int],
                  nms_pre: int = 1000, max_per_img: int = 1000,
                  iou_threshold: float = 0.7, min_bbox_size: float = 0.0,
                  scales=(8,), ratios=(0.5, 1.0, 2.0)):
    """Fixed-shape RPN proposal generation for a batch of views.

    scores[l]: [V, H, W, A] logits; deltas[l]: [V, H, W, A*4].
    Returns (boxes [V, max_per_img, 4], scores [V, max_per_img],
    valid [V, max_per_img]).
    """
    V = scores[0].shape[0]
    lvl_boxes, lvl_scores = [], []
    for l, (s, d) in enumerate(zip(scores, deltas)):
        H, W = s.shape[1], s.shape[2]
        anchors = jnp.asarray(grid_anchors((H, W), strides[l], scales, ratios))
        A = s.shape[-1]
        s = s.reshape(V, -1)                                 # [V, HWA]
        n_pre = min(nms_pre, s.shape[1])
        # fast_topk: exact lax.top_k here lowers to a ~2 ms chunked
        # key-value sort in-net on TPU (see core/topk.py)
        top_s, top_i = fast_topk(s, n_pre)
        top_anchor = anchors[top_i]                          # [V, n_pre, 4]
        # gather deltas WITHOUT reshaping the full map to [V, HWA, 4]
        # (that reshape relayouts the whole delta tensor - ~1 ms at p2):
        # pick the pixel row from the native [V, HW, A*4] view, then the
        # anchor's 4-slice
        dr = d.reshape(V, H * W, A * 4)
        rows = jnp.take_along_axis(dr, (top_i // A)[..., None], axis=1)
        top_d = jnp.take_along_axis(
            rows.reshape(V, n_pre, A, 4),
            (top_i % A)[..., None, None], axis=2)[:, :, 0]
        boxes = delta2bbox(top_anchor, top_d, max_shape=image_shape)
        lvl_boxes.append(boxes)
        lvl_scores.append(top_s)
    # mmdet RPNHead._get_bboxes_single suppresses via batched_nms with
    # LEVEL ids: proposals only suppress within their own FPN level, so
    # the greedy NMS runs per (view, level) here - 5x shallower
    # sequential block scan and 5x less IoU work than one concatenated
    # pass - and the kept sets merge by global score, which is exactly
    # what batched_nms + dets[:max_per_img] computes.
    n_max = max(x.shape[1] for x in lvl_boxes)

    def pad_lvl(x):
        p = n_max - x.shape[1]
        if p == 0:
            return x
        return jnp.pad(x, ((0, 0), (0, p)) + ((0, 0),) * (x.ndim - 2))

    b = jnp.stack([pad_lvl(x) for x in lvl_boxes], axis=1)   # [V, L, n, 4]
    s = jax.nn.sigmoid(jnp.stack([pad_lvl(x) for x in lvl_scores], axis=1))
    wh = b[..., 2:4] - b[..., 0:2]
    n_lvl = jnp.asarray([x.shape[1] for x in lvl_boxes])
    valid = (jnp.all(wh > min_bbox_size, axis=-1) &
             (jnp.arange(n_max)[None, None, :] < n_lvl[None, :, None]))
    def per_level(b_, s_, v_):
        return nms_sorted_keep(b_, s_, v_, iou_threshold)

    ob, os_ = jax.vmap(jax.vmap(per_level))(b, s, valid)
    # merge levels with ONE top-k over the masked scores (suppressed =
    # _NEG) - replaces each level's compaction argsort; batched_nms +
    # dets[:max_per_img] sorts the kept set globally by score too
    L = b.shape[1]
    flat_b = ob.reshape(V, L * n_max, 4)
    flat_s = os_.reshape(V, L * n_max)
    n_out = min(max_per_img, L * n_max)
    top_s, top_i = jax.lax.top_k(flat_s, n_out)   # exact: proposal parity
    out_boxes = jnp.take_along_axis(flat_b, top_i[..., None], axis=1)
    return out_boxes, top_s, top_s > _NEG / 2
