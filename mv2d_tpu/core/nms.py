"""Padded, fixed-shape NMS for XLA/TPU.

Replaces the mmcv CUDA `nms`/`batched_nms` (used via detection_proposal cfg,
ref: configs/mv2d/exp/..._ep24.py:128-133) and the mmdet3d rotated BEV NMS
(`box3d_multiclass_nms`, ref: models/detectors/mv2d.py:277-278).

All functions take and return fixed-size arrays with validity masks so the
enclosing program compiles once.  Suppression is the exact greedy algorithm
(score-descending scan) expressed as a `lax.fori_loop`.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import boxes as box_utils
from .topk import fast_topk

_NEG = -1e10


# scan block: sequential depth = N/B and per-step latency dominates on
# TPU (measured at RPN shape 12x4544: B=64 14.6 ms, 128 10.1 ms,
# 256 8.3 ms); exactness is block-size independent
_NMS_BLOCK = int(__import__('os').environ.get('MV2D_NMS_BLOCK', '256'))


def _greedy_suppress_boxes(boxes: jnp.ndarray, valid: jnp.ndarray,
                           iou_threshold: float, iou_fn) -> jnp.ndarray:
    """Exact greedy NMS over score-sorted boxes in O(N/B) sequential steps.

    boxes: [N, D] (sorted by descending score), valid: [N].  Returns keep
    mask [N].

    TPU-friendly blocked formulation: a lax.scan over B-sized blocks; each
    step computes ONLY the [N, B] IoU slab for its block (never the full
    [N, N] matrix - at RPN scale that is >20 GB), suppresses the block from
    all earlier KEPT boxes with one masked reduction, then resolves the
    within-block chain with B unrolled vector ops.  Sequential depth drops
    from N (naive fori_loop) to N/B.
    """
    n, d = boxes.shape
    B = _NMS_BLOCK
    nb = -(-n // B)
    pad = nb * B - n
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    N = nb * B
    idx = jnp.arange(N)

    r_idx = jnp.arange(B)
    strictly_upper = r_idx[:, None] < r_idx[None, :]

    def body(kept, blk):
        start = blk * B
        blk_boxes = jax.lax.dynamic_slice(boxes, (start, 0), (B, d))
        cols = iou_fn(boxes, blk_boxes) > iou_threshold             # [N, B]
        earlier = idx < start
        sup_prev = jnp.any(cols & (kept & earlier)[:, None], axis=0)  # [B]
        cand = jax.lax.dynamic_slice(kept, (start,), (B,)) & ~sup_prev
        kill = jax.lax.dynamic_slice(cols, (start, 0), (B, B)) \
            & strictly_upper                                        # [B, B]

        # exact within-block greedy via damped fixpoint:
        #   k <- cand & ~any_i (kill[i, :] & k[i])
        # converges to the (unique) greedy solution in <= suppression-chain
        # depth iterations (typically ~3), checked by the while condition.
        def fix_cond(state):
            k, prev, it = state
            return jnp.any(k != prev) & (it < B)

        def fix_body(state):
            k, _, it = state
            k_new = cand & ~jnp.any(kill & k[:, None], axis=0)
            return k_new, k, it + 1

        k0 = cand & ~jnp.any(kill & cand[:, None], axis=0)
        blk_keep, _, _ = jax.lax.while_loop(fix_cond, fix_body,
                                            (k0, cand, jnp.int32(0)))
        kept = jax.lax.dynamic_update_slice(kept, blk_keep, (start,))
        return kept, None

    keep, _ = jax.lax.scan(body, valid, jnp.arange(nb))
    return keep[:n]


def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               iou_threshold: float, max_out: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Class-agnostic 2D NMS on (x1,y1,x2,y2) boxes.

    boxes: [N, 4], scores/valid: [N].  Returns (boxes [max_out, 4],
    scores [max_out], indices-into-input [max_out], valid [max_out]),
    score-descending.
    """
    masked = jnp.where(valid, scores, _NEG)
    order = jnp.argsort(-masked)
    b = boxes[order]
    s = masked[order]
    v = valid[order]
    # NOTE: a single-kernel Pallas NMS was measured 9x SLOWER than this
    # blocked scan on v5e (per-iteration dynamic scalar reads; removed,
    # see git history).  A max_out early-exit while_loop variant crashed
    # the axon TPU worker reproducibly (docs/PERF.md) - keep the scan.
    keep = _greedy_suppress_boxes(b, v, iou_threshold,
                                  box_utils.box_iou_xyxy)
    # compact kept entries to the front (stable: already score-sorted)
    sel = jnp.argsort(~keep, stable=True)[:max_out]
    out_valid = keep[sel]
    return (b[sel], jnp.where(out_valid, s[sel], _NEG), order[sel], out_valid)


def nms_sorted_keep(boxes: jnp.ndarray, scores: jnp.ndarray,
                    valid: jnp.ndarray, iou_threshold: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS WITHOUT output compaction: returns the score-sorted
    boxes and their post-suppression scores (suppressed/invalid = _NEG).

    For callers that merge several NMS runs (e.g. per-FPN-level RPN
    suppression) a single top-k over the merged masked scores replaces
    each run's compaction argsort."""
    masked = jnp.where(valid, scores, _NEG)
    order = jnp.argsort(-masked)
    b = boxes[order]
    s = masked[order]
    v = valid[order]
    keep = _greedy_suppress_boxes(b, v, iou_threshold,
                                  box_utils.box_iou_xyxy)
    return b, jnp.where(keep, s, _NEG)


def multiclass_nms_2d(boxes: jnp.ndarray, scores: jnp.ndarray,
                      valid: jnp.ndarray, score_thr: float,
                      iou_threshold: float, nms_pre: int, max_out: int,
                      class_agnostic: bool = True, min_bbox_size: float = 0.0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-class detection NMS for one image (fixed shapes).

    Mirrors mmdet `multiclass_nms` with the MV2D detection_proposal settings
    (class-specific regression, class-agnostic suppression; ref exp config
    `detection_proposal` at ..._ep24.py:128-133 plus min_bbox_size filtering
    at models/detectors/mv2d.py:75-84).

    boxes: [R, C, 4] class-specific boxes, scores: [R, C] (background column
    already dropped), valid: [R].
    Returns (boxes [max_out, 4], scores [max_out], labels [max_out],
    valid [max_out]).
    """
    R, C = scores.shape
    flat_boxes = boxes.reshape(R * C, 4)
    flat_scores = scores.reshape(R * C)
    labels = jnp.tile(jnp.arange(C, dtype=jnp.int32)[None], (R, 1)).reshape(-1)
    ok = jnp.repeat(valid, C) & (flat_scores > score_thr)
    if min_bbox_size > 0:
        wh = flat_boxes[:, 2:4] - flat_boxes[:, 0:2]
        ok = ok & jnp.all(wh >= min_bbox_size, axis=-1)
    masked = jnp.where(ok, flat_scores, _NEG)
    n_pre = min(nms_pre, R * C)
    top_scores, top_idx = fast_topk(masked, n_pre)
    top_boxes = flat_boxes[top_idx]
    top_labels = labels[top_idx]
    top_valid = ok[top_idx]
    if not class_agnostic:
        # offset boxes per class so cross-class pairs never overlap
        offs = top_labels.astype(top_boxes.dtype)[:, None] * 1e4
        nms_boxes = top_boxes + offs
    else:
        nms_boxes = top_boxes
    ob, os, oi, ov = nms_padded(nms_boxes, top_scores, top_valid,
                                iou_threshold, max_out)
    return top_boxes[oi], os, top_labels[oi], ov


def nms_bev_padded(boxes_bev: jnp.ndarray, scores: jnp.ndarray,
                   valid: jnp.ndarray, iou_threshold: float, max_out: int):
    """Rotated BEV NMS. boxes_bev: [N, 5] (cx, cy, w, l, yaw)."""
    masked = jnp.where(valid, scores, _NEG)
    order = jnp.argsort(-masked)
    b = boxes_bev[order]
    v = valid[order]
    keep = _greedy_suppress_boxes(b, v, iou_threshold,
                                  box_utils.rotated_iou_bev)
    sel = jnp.argsort(~keep, stable=True)[:max_out]
    out_valid = keep[sel]
    return order[sel], jnp.where(out_valid, masked[order][sel], _NEG), out_valid


def box3d_multiclass_nms(boxes3d: jnp.ndarray, boxes_bev: jnp.ndarray,
                         scores: jnp.ndarray, valid: jnp.ndarray,
                         score_thr: float, max_per_scene: int,
                         iou_threshold: float, num_classes: int):
    """Cross-view 3D box merge (ref: mv2d.py:265-282; mmdet3d
    box3d_multiclass_nms with use_rotate_nms).

    boxes3d: [N, B] bottom-center boxes, boxes_bev: [N, 5], scores: [N, C+1]
    (last column = background, ignored), valid: [N].
    Returns (boxes3d [max_per_scene, B], scores, labels, valid).

    The shipped MV2D test cfg uses nms_thr=1.0 (pass-through dedup,
    ..._ep24.py:154-158); this implements the general per-class rotated NMS.
    """
    N = boxes3d.shape[0]
    sel_boxes, sel_scores, sel_labels, sel_valid = [], [], [], []
    for cls in range(num_classes):
        s = scores[:, cls]
        ok = valid & (s > score_thr)
        if iou_threshold >= 1.0:
            # exact pass-through: suppression can never trigger
            keep_idx = jnp.arange(N)
            keep_scores = jnp.where(ok, s, _NEG)
            keep_valid = ok
        else:
            keep_idx, keep_scores, keep_valid = nms_bev_padded(
                boxes_bev, s, ok, iou_threshold, N)
        sel_boxes.append(boxes3d[keep_idx])
        sel_scores.append(keep_scores)
        sel_labels.append(jnp.full((N,), cls, dtype=jnp.int32))
        sel_valid.append(keep_valid)
    all_boxes = jnp.concatenate(sel_boxes, 0)
    all_scores = jnp.concatenate(sel_scores, 0)
    all_labels = jnp.concatenate(sel_labels, 0)
    all_valid = jnp.concatenate(sel_valid, 0)
    k = min(max_per_scene, all_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(
        jnp.where(all_valid, all_scores, _NEG), k)
    out_valid = all_valid[top_idx]
    return (all_boxes[top_idx], jnp.where(out_valid, top_scores, 0.0),
            all_labels[top_idx], out_valid)
