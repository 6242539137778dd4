"""3D head training losses: per-layer Hungarian matching + focal/L1 + DN.

Re-implements CrossAttentionBoxHead.loss_single / dn_loss_single (ref:
models/roi_heads/bbox_heads/cross_attention_head.py:380-434, 476-538) and the
per-layer stage weighting (mv2d_head.py:233-246, mv2d_s_head.py:276-305) with
fixed shapes: padded queries/GT carry zero weights, and the reference's
`reduce_mean` cross-GPU normalizers become global means over the (possibly
device-sharded) batch, applied by the caller via `avg_factor` overrides.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import matching
from ..core.boxes import bottom_to_gravity, normalize_bbox
from ..models.mv2d import DNInfo, ForwardOutputs, GroundTruth3D, MV2DConfig
from ..ops.focal_loss import sigmoid_focal_loss, weighted_l1_loss

CODE_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.5, 1.5, 2.0, 2.0)


class LayerLoss(NamedTuple):
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    num_pos: jnp.ndarray


def single_layer_loss(cls_scores: jnp.ndarray, bbox_preds: jnp.ndarray,
                      query_valid: jnp.ndarray, gt_code: jnp.ndarray,
                      gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                      num_classes: int,
                      code_weights: Sequence[float] = CODE_WEIGHTS,
                      cls_avg_factor: Optional[jnp.ndarray] = None,
                      bbox_avg_factor: Optional[jnp.ndarray] = None
                      ) -> LayerLoss:
    """One decoder layer's matching loss.

    cls_scores: [Q, C]; bbox_preds: [Q, 10]; gt_code: [G, 10] normalized
    (gravity-center) target codes; gt_labels/valid: [G].
    """
    cost = matching.focal_loss_cost(cls_scores, gt_labels, weight=2.0) + \
        matching.bbox3d_l1_cost(bbox_preds, gt_code, weight=0.25)
    assigned, pos = matching.hungarian_assign(cost, query_valid, gt_valid)
    num_pos = pos.sum().astype(jnp.float32)

    safe_idx = jnp.clip(assigned, 0, gt_code.shape[0] - 1)
    labels = jnp.where(pos, gt_labels[safe_idx], num_classes)
    label_weights = query_valid.astype(jnp.float32)
    targets = jnp.where(pos[:, None], gt_code[safe_idx], 0.0)
    cw = jnp.asarray(code_weights, dtype=bbox_preds.dtype)
    bbox_weights = pos[:, None].astype(bbox_preds.dtype) * cw[None]

    cls_avg = cls_avg_factor if cls_avg_factor is not None else num_pos
    bbox_avg = bbox_avg_factor if bbox_avg_factor is not None else num_pos
    loss_cls = sigmoid_focal_loss(cls_scores, labels, label_weights,
                                  num_classes, avg_factor=cls_avg,
                                  loss_weight=2.0)
    notnan = jnp.isfinite(targets).all(-1, keepdims=True)
    loss_bbox = weighted_l1_loss(bbox_preds, jnp.nan_to_num(targets),
                                 bbox_weights * notnan,
                                 avg_factor=bbox_avg, loss_weight=0.25)
    return LayerLoss(jnp.nan_to_num(loss_cls), jnp.nan_to_num(loss_bbox),
                     num_pos)


def dn_layer_loss(cls_scores: jnp.ndarray, bbox_preds: jnp.ndarray,
                  dn: DNInfo, cfg: MV2DConfig,
                  code_weights: Sequence[float] = CODE_WEIGHTS,
                  num_tgt_override: Optional[jnp.ndarray] = None,
                  bbox_avg_factor: Optional[jnp.ndarray] = None
                  ) -> LayerLoss:
    """Denoising loss for one layer (ref dn_loss_single,
    cross_attention_head.py:476-538)."""
    num_tgt = (cfg.denoise_scalar * dn.num_gt).astype(jnp.float32)
    if num_tgt_override is not None:
        num_tgt = num_tgt_override
    split = cfg.denoise_split
    cls_avg = num_tgt * 3.14159 / 6 * split ** 3
    label_weights = dn.valid.astype(jnp.float32)
    loss_cls = sigmoid_focal_loss(cls_scores, dn.known_labels, label_weights,
                                  cfg.num_classes,
                                  avg_factor=jnp.maximum(cls_avg, 1.0),
                                  loss_weight=2.0)
    boxes = dn.known_boxes
    neg = dn.known_labels == cfg.num_classes
    neg_bbox_loss = True   # MV2D-T recipe (..._ep24.py:45)
    if not neg_bbox_loss:
        boxes = jnp.where(neg[:, None], 0.0, boxes)
    targets = normalize_bbox(boxes)
    cw = jnp.asarray(code_weights, dtype=bbox_preds.dtype)
    bbox_weights = jnp.broadcast_to(cw[None], bbox_preds.shape)
    bbox_weights = bbox_weights * dn.valid[:, None]
    # dn zeroes the yaw terms (ref :531 - "dn always reduces mAOE")
    bbox_weights = bbox_weights.at[:, 6:8].set(0.0)
    notnan = jnp.isfinite(targets).all(-1, keepdims=True)
    bbox_avg = bbox_avg_factor if bbox_avg_factor is not None \
        else jnp.maximum(num_tgt, 1.0)
    loss_bbox = weighted_l1_loss(bbox_preds, jnp.nan_to_num(targets),
                                 bbox_weights * notnan,
                                 avg_factor=bbox_avg, loss_weight=0.25)
    return LayerLoss(jnp.nan_to_num(loss_cls), jnp.nan_to_num(loss_bbox),
                     num_tgt)


def mv2d_head_loss(out: ForwardOutputs, gt: GroundTruth3D, cfg: MV2DConfig,
                   sync_bbox_norm: bool = False):
    """Full per-layer stage-weighted 3D losses for one sample.

    Reference normalizer semantics (cross_attention_head.py:404-431,
    507-522; sync_cls_avg_factor defaults to False and no config sets it):
    the CLS losses are normalized by the LOCAL max(num_pos, 1), but the
    BBOX losses by the cross-GPU `reduce_mean` of num_pos (num_tgt for DN),
    clamped at 1.  With sync_bbox_norm=True the bbox losses are therefore
    returned UN-normalized in a second dict {key: (weighted_sum, factor)}
    so the caller can divide by the global batch-mean factor (E[l]/E[n],
    not E[l/n]).
    """
    gravity = bottom_to_gravity(gt.boxes)
    gt_code = normalize_bbox(gravity)
    losses: Dict[str, jnp.ndarray] = {}
    deferred: Dict[str, tuple] = {}
    L = out.all_cls_scores.shape[0]
    one = jnp.asarray(1.0) if sync_bbox_norm else None
    # the per-layer matchings are independent: vmap over layers batches the
    # cost matmuls AND the sequential JV augmenting loops (total while_loop
    # trips = max over layers instead of their sum)
    ll = jax.vmap(
        lambda cs, bp: single_layer_loss(cs, bp, out.query_valid, gt_code,
                                         gt.labels, gt.valid,
                                         cfg.num_classes,
                                         bbox_avg_factor=one))(
        out.all_cls_scores, out.all_bbox_preds)
    if out.dn_cls_scores is not None:
        dl = jax.vmap(
            lambda cs, bp: dn_layer_loss(cs, bp, out.dn_info, cfg,
                                         bbox_avg_factor=one))(
            out.dn_cls_scores, out.dn_bbox_preds)
    for lvl in range(L):
        lw = cfg.stage_loss_weights[lvl]
        losses[f'l{lvl}.loss_cls'] = ll.loss_cls[lvl] * lw
        if sync_bbox_norm:
            deferred[f'l{lvl}.loss_bbox'] = (ll.loss_bbox[lvl] * lw,
                                             ll.num_pos[lvl])
        else:
            losses[f'l{lvl}.loss_bbox'] = ll.loss_bbox[lvl] * lw
        if out.dn_cls_scores is not None:
            losses[f'l{lvl}.dn_loss_cls'] = dl.loss_cls[lvl] * lw
            if sync_bbox_norm:
                deferred[f'l{lvl}.dn_loss_bbox'] = (dl.loss_bbox[lvl] * lw,
                                                    dl.num_pos[lvl])
            else:
                losses[f'l{lvl}.dn_loss_bbox'] = dl.loss_bbox[lvl] * lw
    if sync_bbox_norm:
        return losses, deferred
    return losses
