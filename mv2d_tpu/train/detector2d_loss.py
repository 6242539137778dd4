"""2D detector training: anchor/RoI target assignment, sampling, losses.

Re-implements the mmdet training slice the reference relies on (ref config:
configs/mv2d/detectors/maskrcnn_r50.py:59-98):
  * RPN: MaxIoUAssigner(pos 0.7 / neg 0.3 / min_pos 0.3, low-quality matches)
    + RandomSampler(256, pos_fraction 0.5), BCE + L1 losses,
  * RCNN: MaxIoUAssigner(0.5/0.5/0.5) + RandomSampler(512, pos_fraction 0.25,
    add_gt_as_proposals), softmax CE + per-class L1.

Static-shape strategy: assignment is computed for ALL anchors; "random
sampling of k from a dynamic candidate set" becomes: give every candidate a
random key, rank candidates by key, keep rank < k (k may be a traced scalar).
Losses are weighted sums with fixed-size weight vectors.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.boxes import box_iou_xyxy
from ..nn.rpn import bbox2delta
from ..ops.focal_loss import (binary_cross_entropy, softmax_cross_entropy,
                              weighted_l1_loss)


class AssignResult(NamedTuple):
    assigned_gt: jnp.ndarray   # [N] int32, -1 = ignore/none, >=0 = gt index
    is_pos: jnp.ndarray        # [N] bool
    is_neg: jnp.ndarray        # [N] bool
    max_iou: jnp.ndarray       # [N]


def max_iou_assign(boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_valid: jnp.ndarray, pos_iou_thr: float,
                   neg_iou_thr: float, min_pos_iou: float,
                   match_low_quality: bool = True) -> AssignResult:
    """mmdet MaxIoUAssigner with padded GT. boxes: [N, 4]; gt: [G, 4]."""
    iou = box_iou_xyxy(boxes, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    max_iou = iou.max(-1)
    argmax_gt = iou.argmax(-1)
    # with zero valid GT all IoUs are 0 -> everything becomes background,
    # matching mmdet's num_gts==0 branch (all assigned 0)
    is_neg = max_iou < neg_iou_thr
    is_pos = max_iou >= pos_iou_thr
    assigned = jnp.where(is_pos, argmax_gt, -1)
    if match_low_quality:
        # for each gt, its best anchors become positive (>= min_pos_iou)
        gt_best = iou.max(0)                                   # [G]
        cand = (iou == gt_best[None, :]) & (gt_best[None, :] >= min_pos_iou) \
            & gt_valid[None, :]
        lowq = cand.any(-1)
        # later gts override earlier ones in mmdet; pick the LAST matching gt
        G = gt_boxes.shape[0]
        last_gt = jnp.where(cand, jnp.arange(G)[None, :], -1).max(-1)
        assigned = jnp.where(lowq, last_gt, assigned)
        is_pos = is_pos | lowq
    is_neg = is_neg & ~is_pos
    return AssignResult(assigned.astype(jnp.int32), is_pos, is_neg, max_iou)


def _select_gt_boxes(assigned_gt: jnp.ndarray, gt_boxes: jnp.ndarray
                     ) -> jnp.ndarray:
    """gt_boxes[clip(assigned_gt)] as a one-hot matmul: a row gather of
    180k anchor rows from the tiny GT table is descriptor-bound on TPU
    (~1 ms/view in the train step); the [N, G] x [G, 4] matmul is free.
    HIGHEST precision: exactly one 1.0*v term per row reconstructs v
    exactly under bf16x3."""
    G = gt_boxes.shape[0]
    safe = jnp.clip(assigned_gt, 0, G - 1)
    onehot = (safe[:, None] == jnp.arange(G)[None, :]).astype(jnp.float32)
    return jax.lax.dot_general(
        onehot, gt_boxes.astype(jnp.float32), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def random_sample(rng: jax.Array, is_pos: jnp.ndarray, is_neg: jnp.ndarray,
                  num: int, pos_fraction: float
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mmdet RandomSampler with static shapes.

    Returns (pos_selected [N] bool, neg_selected [N] bool) with at most
    num*pos_fraction positives and (num - n_pos_sampled) negatives."""
    n = is_pos.shape[0]
    k_pos = int(num * pos_fraction)
    kp, kn = jax.random.split(rng)
    # top_k of the negated key = the k smallest keys; a full
    # argsort(argsort(.)) rank costs two [N]-sorts per view (~8 ms/step at
    # 180k anchors), top_k(N, 256) is ~10x cheaper on TPU
    pos_key = jnp.where(is_pos, jax.random.uniform(kp, (n,)), 2.0)
    _, pidx = jax.lax.top_k(-pos_key, min(k_pos, n))
    pos_sel = jnp.zeros((n,), bool).at[pidx].set(True) & is_pos
    n_pos = pos_sel.sum()
    k_neg = num - jnp.minimum(n_pos, k_pos)
    neg_key = jnp.where(is_neg, jax.random.uniform(kn, (n,)), 2.0)
    _, nidx = jax.lax.top_k(-neg_key, min(num, n))  # ascending key order
    take = jnp.arange(min(num, n)) < k_neg
    neg_sel = jnp.zeros((n,), bool).at[nidx].max(take) & is_neg
    return pos_sel, neg_sel


def rpn_loss(rng: jax.Array, flat_scores: jnp.ndarray,
             flat_deltas: jnp.ndarray, anchors: jnp.ndarray,
             gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
             num_sample: int = 256, pos_fraction: float = 0.5
             ) -> Dict[str, jnp.ndarray]:
    """RPN losses for ONE view.

    flat_scores: [N] logits (all levels concat); flat_deltas: [N, 4];
    anchors: [N, 4] in matching order.  vmap over views for a batch."""
    assign = max_iou_assign(anchors, gt_boxes, gt_valid, 0.7, 0.3, 0.3)
    pos_sel, neg_sel = random_sample(rng, assign.is_pos, assign.is_neg,
                                     num_sample, pos_fraction)
    sampled = pos_sel | neg_sel
    labels = pos_sel.astype(flat_scores.dtype)
    weights = sampled.astype(flat_scores.dtype)
    avg = jnp.maximum(sampled.sum().astype(jnp.float32), 1.0)
    loss_cls = binary_cross_entropy(flat_scores, labels, weights, avg)
    target = bbox2delta(anchors, _select_gt_boxes(assign.assigned_gt,
                                                  gt_boxes))
    w = pos_sel[:, None].astype(flat_deltas.dtype)
    loss_bbox = weighted_l1_loss(flat_deltas, jnp.nan_to_num(target), w, avg)
    return {'loss_rpn_cls': loss_cls, 'loss_rpn_bbox': loss_bbox,
            'rpn_num_pos': pos_sel.sum()}


class RCNNSamples(NamedTuple):
    rois: jnp.ndarray          # [S, 4] sampled boxes (image pixels)
    labels: jnp.ndarray        # [S] int32, num_classes = background
    reg_targets: jnp.ndarray   # [S, 4] deltas
    is_pos: jnp.ndarray        # [S]
    weight: jnp.ndarray        # [S] 1.0 for sampled slots


def rcnn_sample(rng: jax.Array, proposals: jnp.ndarray,
                proposal_valid: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                num_classes: int = 10, num_sample: int = 512,
                pos_fraction: float = 0.25) -> RCNNSamples:
    """Assign + sample RoIs for ONE view (add_gt_as_proposals=True)."""
    boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)
    assign = max_iou_assign(boxes, gt_boxes, gt_valid, 0.5, 0.5, 0.5)
    is_pos = assign.is_pos & valid
    is_neg = assign.is_neg & valid
    pos_sel, neg_sel = random_sample(rng, is_pos, is_neg, num_sample,
                                     pos_fraction)
    sampled = pos_sel | neg_sel
    # compact sampled rois to fixed S slots (sampled first, stable)
    order = jnp.argsort(~sampled, stable=True)[:num_sample]
    sel_boxes = boxes[order]
    sel_pos = pos_sel[order]
    sel_weight = sampled[order].astype(jnp.float32)
    safe_gt = jnp.clip(assign.assigned_gt[order], 0, gt_boxes.shape[0] - 1)
    labels = jnp.where(sel_pos, gt_labels[safe_gt], num_classes)
    reg_targets = bbox2delta(sel_boxes, gt_boxes[safe_gt],
                             stds=(0.1, 0.1, 0.2, 0.2))
    return RCNNSamples(sel_boxes, labels.astype(jnp.int32),
                       jnp.nan_to_num(reg_targets), sel_pos, sel_weight)


def rcnn_loss(cls_logits: jnp.ndarray, reg_deltas: jnp.ndarray,
              samples: RCNNSamples, num_classes: int = 10
              ) -> Dict[str, jnp.ndarray]:
    """cls_logits: [S, K+1]; reg_deltas: [S, K*4] (class-specific)."""
    avg = jnp.maximum(samples.weight.sum(), 1.0)
    loss_cls = softmax_cross_entropy(cls_logits, samples.labels,
                                     samples.weight, avg)
    d = reg_deltas.reshape(-1, num_classes, 4)
    safe_lbl = jnp.clip(samples.labels, 0, num_classes - 1)
    d_sel = jnp.take_along_axis(d, safe_lbl[:, None, None].repeat(4, -1),
                                axis=1)[:, 0]
    w = (samples.is_pos * samples.weight)[:, None]
    loss_bbox = weighted_l1_loss(d_sel, samples.reg_targets, w, avg)
    return {'loss_cls': loss_cls, 'loss_bbox': loss_bbox,
            'rcnn_num_pos': samples.is_pos.sum()}


def single_stage_loss(flat_scores: jnp.ndarray, flat_deltas: jnp.ndarray,
                      anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                      gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                      num_classes: int = 10) -> Dict[str, jnp.ndarray]:
    """RetinaNet-style anchor-head losses for ONE view (the training side
    of the single-stage detector family, ref SingleStageDetBase
    forward_train_w_feat -> mmdet RetinaHead.loss semantics):
    MaxIoUAssigner(0.5/0.4/0, low-quality matches) over ALL anchors,
    sigmoid focal loss (alpha .25, gamma 2) averaged by num_pos, and L1 on
    positive anchor deltas.

    flat_scores: [N, K] logits; flat_deltas: [N, 4]; anchors: [N, 4].
    """
    from ..ops.focal_loss import sigmoid_focal_loss
    assign = max_iou_assign(anchors, gt_boxes, gt_valid, 0.5, 0.4, 0.0)
    n, k = flat_scores.shape
    safe_gt = jnp.clip(assign.assigned_gt, 0, gt_boxes.shape[0] - 1)
    labels = jnp.where(assign.is_pos, gt_labels[safe_gt], num_classes)
    weights = (assign.is_pos | assign.is_neg).astype(jnp.float32)
    avg = jnp.maximum(assign.is_pos.sum().astype(jnp.float32), 1.0)
    loss_cls = sigmoid_focal_loss(flat_scores, labels, weights,
                                  num_classes, avg_factor=avg)
    target = bbox2delta(anchors, _select_gt_boxes(assign.assigned_gt,
                                                  gt_boxes))
    w = assign.is_pos[:, None].astype(flat_deltas.dtype)
    loss_bbox = weighted_l1_loss(flat_deltas, jnp.nan_to_num(target), w, avg)
    return {'loss_cls': loss_cls, 'loss_bbox': loss_bbox,
            'num_pos': assign.is_pos.sum()}
