"""Single jitted training step: full MV2D loss + AdamW update.

Replaces the mmcv EpochBasedRunner + Fp16OptimizerHook train_step (ref:
configs/mv2d/exp/..._ep24.py:179-183, SURVEY 3.1 call stack) with one XLA
program: grid-mask aug, backbone, RPN/RCNN 2D losses, no-grad detections +
GT complement, the 3D head with DN, Hungarian matching (host callback), and
the clipped AdamW update.  bf16 is unnecessary-loss-scaling-free on TPU; the
reference's fp32 islands stay fp32.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..core.geometry import CameraParams
from ..models.mv2d import (MV2D, ForwardOutputs, GroundTruth2D,
                           GroundTruth3D, MV2DConfig)
from ..nn.rpn import grid_anchors, rpn_proposals
from . import detector2d_loss as d2l
from .losses import mv2d_head_loss


@struct.dataclass
class TrainBatch:
    """One scene (the reference trains 1 scene per device, README.md:42)."""
    imgs: jnp.ndarray          # [V, H, W, 3] normalized
    cam: CameraParams
    img_shapes: jnp.ndarray    # [V, 2]
    gt2d: GroundTruth2D
    gt3d: GroundTruth3D


@struct.dataclass
class TrainState:
    params: Any
    constants: Any
    opt_state: Any
    step: jnp.ndarray


def _all_anchors(cfg: MV2DConfig) -> jnp.ndarray:
    H, W = cfg.image_size
    anchors = [grid_anchors((int(np.ceil(H / s)), int(np.ceil(W / s))), s)
               for s in (4, 8, 16, 32, 64)]
    return jnp.asarray(np.concatenate(anchors, axis=0))


def _bf16_cast(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x, tree)


def compute_losses(model: MV2D, variables, batch: TrainBatch,
                   rng: jax.Array,
                   mixed_precision: bool = True,
                   sync_bbox_norm: bool = False):
    """Full training losses for one scene.

    mixed_precision=True runs the forward in bf16 (params cast per step,
    f32 master copies stay in the optimizer) - the TPU equivalent of the
    reference's Fp16OptimizerHook + dynamic loss scale (bf16 needs no
    scaling; geometry fp32 islands are explicit casts inside the model,
    and losses are computed in f32 like the reference's force_fp32 heads).

    sync_bbox_norm=True returns (total, metrics, deferred) where `deferred`
    holds the 3D bbox losses as (weighted_sum, num_pos) pairs NOT included
    in `total`: the caller normalizes them by the global batch-mean num_pos
    (the reference's cross-GPU reduce_mean, cross_attention_head.py:419-420,
    517-521) and adds them to the total.
    """
    cfg = model.cfg
    if mixed_precision:
        variables = dict(variables)
        variables['params'] = _bf16_cast(variables['params'])
        batch = batch.replace(imgs=batch.imgs.astype(jnp.bfloat16))
    r_aug, r_dn, r_drop, r_rpn, r_rcnn = jax.random.split(rng, 5)
    out, det_raw = model.apply(
        variables, batch.imgs, batch.cam, batch.img_shapes, batch.gt2d,
        batch.gt3d, method=MV2D.forward_train,
        rngs={'aug': r_aug, 'dn': r_dn, 'dropout': r_drop})
    if mixed_precision:
        # losses in f32 (the reference's force_fp32 heads)
        up = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, 'dtype') and x.dtype == jnp.bfloat16 else x, t)
        out = up(out)
        # rpn score/delta maps stay bf16: the loss helpers upcast
        # INSIDE their fused bodies (focal_loss.py), so casting the
        # full [V, ~180k] maps here only materialized f32 copies
        # (~3.3 ms/step of HBM traffic at recipe shapes)

    if sync_bbox_norm:
        losses, deferred = mv2d_head_loss(out, batch.gt3d, cfg,
                                          sync_bbox_norm=True)
    else:
        losses = mv2d_head_loss(out, batch.gt3d, cfg)
        deferred = {}

    Vc = cfg.num_views if cfg.num_frames > 1 else cfg.total_views
    if cfg.detector_type == 'single_stage':
        # anchor-head focal + L1 losses (the single-stage detector family
        # has no RPN/RCNN stages)
        from ..nn.retina import retina_scales
        H, W = cfg.image_size
        anchors = jnp.asarray(np.concatenate(
            [np.asarray(grid_anchors(
                (int(np.ceil(H / s)), int(np.ceil(W / s))), s,
                scales=retina_scales()))
             for s in (4, 8, 16, 32, 64)], axis=0))
        K = cfg.num_classes
        flat_scores = jnp.concatenate(
            [s.reshape(s.shape[0], -1, K)
             for s in det_raw['rpn_scores']], axis=1)
        flat_deltas = jnp.concatenate(
            [d.reshape(d.shape[0], -1, 4)
             for d in det_raw['rpn_deltas']], axis=1)
        ss = jax.vmap(
            lambda s, d, gb, gl, gv: d2l.single_stage_loss(
                s, d, anchors, gb, gl, gv, K))(
            flat_scores[:Vc], flat_deltas[:Vc], batch.gt2d.boxes[:Vc],
            batch.gt2d.labels[:Vc], batch.gt2d.valid[:Vc])
        losses['det_loss_cls'] = ss['loss_cls'].mean()
        losses['det_loss_bbox'] = ss['loss_bbox'].mean()
        total = sum(v for k, v in losses.items() if 'loss' in k)
        metrics = dict(losses)
        metrics['det_num_pos'] = ss['num_pos'].sum()
        metrics['num_queries'] = out.query_valid.sum()
        if sync_bbox_norm:
            return total, metrics, deferred
        return total, metrics

    # ---- RPN losses (current-frame views only, ref mv2d_t.py:97-105)
    anchors = _all_anchors(cfg)
    flat_scores = jnp.concatenate(
        [s.reshape(s.shape[0], -1) for s in det_raw['rpn_scores']], axis=1)
    flat_deltas = jnp.concatenate(
        [d.reshape(d.shape[0], -1, 4) for d in det_raw['rpn_deltas']], axis=1)
    rpn_rngs = jax.random.split(r_rpn, Vc)
    rpn = jax.vmap(
        lambda k, s, d, gb, gv: d2l.rpn_loss(k, s, d, anchors, gb, gv))(
        rpn_rngs, flat_scores[:Vc], flat_deltas[:Vc],
        batch.gt2d.boxes[:Vc], batch.gt2d.valid[:Vc])
    losses['det_loss_rpn_cls'] = rpn['loss_rpn_cls'].mean()
    losses['det_loss_rpn_bbox'] = rpn['loss_rpn_bbox'].mean()

    # ---- RCNN losses on sampled RoIs (train rpn cfg: nms_pre 2000, max 1000)
    rp_boxes, rp_scores, rp_valid = rpn_proposals(
        [jax.lax.stop_gradient(s[:Vc]) for s in det_raw['rpn_scores']],
        [jax.lax.stop_gradient(d[:Vc]) for d in det_raw['rpn_deltas']],
        (4, 8, 16, 32, 64), cfg.image_size,
        nms_pre=min(2000, flat_scores.shape[1]),
        max_per_img=cfg.proposal_train.rpn_max_per_img,
        iou_threshold=0.7)
    rcnn_rngs = jax.random.split(r_rcnn, Vc)
    samples = jax.vmap(
        lambda k, pb, pv, gb, gl, gv: d2l.rcnn_sample(
            k, pb, pv, gb, gl, gv, cfg.num_classes))(
        rcnn_rngs, rp_boxes, rp_valid, batch.gt2d.boxes[:Vc],
        batch.gt2d.labels[:Vc], batch.gt2d.valid[:Vc])
    S = samples.rois.shape[1]
    flat_rois = samples.rois.reshape(Vc * S, 4)
    cls_logits, reg_deltas = model.apply(
        variables, det_raw['fpn_feats'], samples.rois,
        method=MV2D.rcnn_train_forward)
    cls_logits = cls_logits.astype(jnp.float32)
    reg_deltas = reg_deltas.astype(jnp.float32)
    flat_samples = d2l.RCNNSamples(
        rois=flat_rois, labels=samples.labels.reshape(-1),
        reg_targets=samples.reg_targets.reshape(-1, 4),
        is_pos=samples.is_pos.reshape(-1), weight=samples.weight.reshape(-1))
    rcnn = d2l.rcnn_loss(cls_logits, reg_deltas, flat_samples,
                         cfg.num_classes)
    losses['det_loss_cls'] = rcnn['loss_cls']
    losses['det_loss_bbox'] = rcnn['loss_bbox']

    total = sum(v for k, v in losses.items() if 'loss' in k)
    metrics = dict(losses)
    metrics['rpn_num_pos'] = rpn['rpn_num_pos'].sum()
    metrics['rcnn_num_pos'] = rcnn['rcnn_num_pos']
    metrics['num_queries'] = out.query_valid.sum()
    if out.diagnostics and 'key_overflow' in out.diagnostics:
        # silent-drop accounting: >0 means cfg.k_max is undersized for this
        # data (run tools/calibrate_buckets.py and raise it)
        metrics['key_active'] = out.diagnostics['key_active']
        metrics['key_overflow'] = out.diagnostics['key_overflow']
    if sync_bbox_norm:
        return total, metrics, deferred
    return total, metrics


def make_train_step(model: MV2D, tx: optax.GradientTransformation):
    """Returns train_step(state, batch, rng) -> (state, metrics), jittable."""

    def train_step(state: TrainState, batch: TrainBatch, rng: jax.Array):
        def loss_fn(params):
            variables = {'params': params, 'constants': state.constants}
            total, metrics, deferred = compute_losses(
                model, variables, batch, rng, sync_bbox_norm=True)
            # single scene: the "global mean" factor is the local one
            for k, (s, f) in deferred.items():
                v = s / jnp.maximum(f, 1.0)
                total = total + v
                metrics[k] = v
            return total, metrics

        (total, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics['total_loss'] = total
        metrics['grad_norm'] = optax.global_norm(grads)
        return TrainState(params=params, constants=state.constants,
                          opt_state=opt_state, step=state.step + 1), metrics

    return train_step


def init_train_state(model: MV2D, variables, tx) -> TrainState:
    params = variables['params']
    constants = variables.get('constants', {})
    return TrainState(params=params, constants=constants,
                      opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))
