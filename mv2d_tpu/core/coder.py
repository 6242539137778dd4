"""NMS-free top-k decoding of decoder outputs.

Re-implements NMSFreeCoder.decode_single (ref:
mmdet3d_plugin/core/bbox/coders/nms_free_coder.py:49-102) with fixed shapes:
the per-scene result is always [max_num] slots with a validity mask instead of
a dynamically filtered list.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .boxes import denormalize_bbox

_NEG = -1e10


def nms_free_decode(cls_scores: jnp.ndarray,
                    bbox_preds: jnp.ndarray,
                    query_valid: jnp.ndarray,
                    max_num: int,
                    num_classes: int,
                    post_center_range: Sequence[float] | None = None,
                    score_threshold: float | None = None,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flat sigmoid top-k over query x class, then denormalize + range filter.

    cls_scores: [Q, C] logits, bbox_preds: [Q, 10] normalized code,
    query_valid: [Q] bool.
    Returns (boxes [max_num, 9] gravity-center, scores [max_num],
    labels [max_num], valid [max_num]).
    """
    Q, C = cls_scores.shape
    probs = jax.nn.sigmoid(cls_scores)
    flat = jnp.where(query_valid[:, None], probs, _NEG).reshape(-1)
    k = min(max_num, Q * C)
    scores, idx = jax.lax.top_k(flat, k)
    labels = (idx % num_classes).astype(jnp.int32)
    bbox_index = idx // num_classes
    code = bbox_preds[bbox_index]
    boxes = denormalize_bbox(code)                       # [k, 9] gravity center
    valid = query_valid[bbox_index] & (scores > _NEG / 2)
    if score_threshold is not None:
        valid = valid & (scores > score_threshold)
    if post_center_range is not None:
        lo = jnp.asarray(post_center_range[:3], dtype=boxes.dtype)
        hi = jnp.asarray(post_center_range[3:], dtype=boxes.dtype)
        inside = jnp.all(boxes[:, :3] >= lo, axis=-1) & \
                 jnp.all(boxes[:, :3] <= hi, axis=-1)
        valid = valid & inside
    if k < max_num:
        pad = max_num - k
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, (0, pad), constant_values=_NEG)
        labels = jnp.pad(labels, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return boxes, jnp.where(valid, scores, 0.0), labels, valid


def nms_free_cls_decode(cls_scores: jnp.ndarray,
                        bbox_preds: jnp.ndarray,
                        query_valid: jnp.ndarray,
                        max_num: int,
                        num_classes: int,
                        post_center_range: Sequence[float] | None = None,
                        score_threshold: float | None = None):
    """NMSFreeClsCoder variant (ref: nms_free_coder.py:128): softmax over
    classes incl. background, per-QUERY top-k by best-foreground score
    (instead of the flat query x class top-k)."""
    Q, C1 = cls_scores.shape          # C1 = num_classes + 1 (bg last)
    probs = jax.nn.softmax(cls_scores, axis=-1)[:, :num_classes]
    best = jnp.where(query_valid, probs.max(-1), _NEG)
    labels = probs.argmax(-1).astype(jnp.int32)
    k = min(max_num, Q)
    scores, idx = jax.lax.top_k(best, k)
    boxes = denormalize_bbox(bbox_preds[idx])
    valid = query_valid[idx] & (scores > _NEG / 2)
    if score_threshold is not None:
        valid = valid & (scores > score_threshold)
    if post_center_range is not None:
        lo = jnp.asarray(post_center_range[:3], dtype=boxes.dtype)
        hi = jnp.asarray(post_center_range[3:], dtype=boxes.dtype)
        inside = jnp.all(boxes[:, :3] >= lo, axis=-1) & \
                 jnp.all(boxes[:, :3] <= hi, axis=-1)
        valid = valid & inside
    if k < max_num:
        pad = max_num - k
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, (0, pad), constant_values=_NEG)
        idx = jnp.pad(idx, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return boxes, jnp.where(valid, scores, 0.0), labels[idx], valid
