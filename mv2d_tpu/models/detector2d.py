"""Two-stage 2D detector (Faster/Mask R-CNN minus mask branch).

Re-implements the slice of mmdet the reference wraps (ref:
models/detectors/wrap_detector.py:7-87 + configs/mv2d/detectors/
maskrcnn_r50.py): ResNet+FPN backbone shared with the 3D head, RPN proposals,
RoIAlign + Shared2FC head, and the runtime-swappable detection config
(`set_detection_cfg`) realized as an explicit `DetectionProposalCfg` argument.

All outputs are padded fixed-shape `Proposals`.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..core.nms import multiclass_nms_2d
from ..ops.roi_align import multilevel_roi_align
from .. import nn as mnn
from ..nn.fpn import FPN
from ..nn.rcnn import Shared2FCBBoxHead, decode_detections
from ..nn.resnet import ResNet
from ..nn.rpn import RPNHead, rpn_proposals


class DetectionProposalCfg(NamedTuple):
    """Mirrors the reference's detection_proposal dict
    (..._ep24.py:128-133)."""
    score_thr: float = 0.05
    nms_pre: int = 1000
    max_per_img: int = 75
    iou_threshold: float = 0.6
    min_bbox_size: float = 8.0
    rpn_nms_pre: int = 1000
    rpn_max_per_img: int = 1000
    rpn_iou_threshold: float = 0.7


@struct.dataclass
class Proposals:
    boxes: jnp.ndarray     # [V, P, 4] (x1, y1, x2, y2) image pixels
    scores: jnp.ndarray    # [V, P]
    labels: jnp.ndarray    # [V, P] int32
    valid: jnp.ndarray     # [V, P] bool


class SingleStageDetector(nn.Module):
    """Single-stage 2D detector family (ref `SingleStageDetBase`,
    wrap_detector.py:7-33, which lets MV2D run on any mmdet single-stage
    detector): shared backbone+FPN with a RetinaNet-style anchor head,
    decoding into the same padded `Proposals` the 3D head consumes.
    The shipped recipes use the two-stage Faster R-CNN; this is the
    swap-in family (BASELINE.json stretch config)."""
    depth: int = 50
    num_classes: int = 10
    backbone_type: str = 'resnet'          # 'resnet' | 'vovnet'
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    fpn_channels: int = 256
    fpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    remat: bool = False
    frozen_stages: int = 1

    def setup(self):
        from ..nn.retina import RetinaHead
        if self.backbone_type == 'vovnet':
            from ..nn.vovnet import VoVNet
            self.backbone = VoVNet(depth=self.depth)
        else:
            self.backbone = ResNet(depth=self.depth,
                                   stage_with_dcn=self.stage_with_dcn,
                                   frozen_stages=self.frozen_stages,
                                   remat=self.remat)
        self.fpn = FPN(out_channels=self.fpn_channels, num_outs=5)
        self.retina_head = RetinaHead(num_classes=self.num_classes,
                                      feat_channels=self.fpn_channels)

    def extract_feat(self, imgs: jnp.ndarray,
                     fast_inference: bool = False) -> Sequence[jnp.ndarray]:
        return self.fpn(self.backbone(imgs, fast_inference))

    def detect(self, feats: Sequence[jnp.ndarray],
               image_shape: Tuple[int, int],
               cfg: DetectionProposalCfg) -> Proposals:
        from ..nn.retina import single_stage_detections
        scores, deltas = self.retina_head(feats)
        boxes, sc, labels, valid = single_stage_detections(
            scores, deltas, self.fpn_strides, image_shape,
            self.num_classes, score_thr=cfg.score_thr,
            nms_pre=cfg.nms_pre, iou_threshold=cfg.iou_threshold,
            max_per_img=cfg.max_per_img, min_bbox_size=cfg.min_bbox_size)
        return Proposals(boxes=boxes, scores=sc, labels=labels, valid=valid)


class TwoStageDetector(nn.Module):
    depth: int = 50
    num_classes: int = 10
    backbone_type: str = 'resnet'          # 'resnet' | 'vovnet'
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    fpn_channels: int = 256
    rcnn_fc_channels: int = 1024
    fpn_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    remat: bool = False
    frozen_stages: int = 1

    def setup(self):
        if self.backbone_type == 'vovnet':
            from ..nn.vovnet import VoVNet
            self.backbone = VoVNet(depth=self.depth)
        else:
            self.backbone = ResNet(depth=self.depth,
                                   stage_with_dcn=self.stage_with_dcn,
                                   frozen_stages=self.frozen_stages,
                                   remat=self.remat)
        self.fpn = FPN(out_channels=self.fpn_channels, num_outs=5)
        self.rpn_head = RPNHead(feat_channels=self.fpn_channels)
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes,
            fc_out_channels=self.rcnn_fc_channels)

    def extract_feat(self, imgs: jnp.ndarray,
                     fast_inference: bool = False) -> Sequence[jnp.ndarray]:
        """imgs: [V, H, W, 3] -> FPN levels p2..p6 (channels-last).

        fast_inference routes DCN blocks through the no-grad Pallas band
        kernel (TPU eval path only)."""
        return self.fpn(self.backbone(imgs, fast_inference))

    def rpn(self, feats: Sequence[jnp.ndarray],
            image_shape: Tuple[int, int], cfg: DetectionProposalCfg):
        scores, deltas = self.rpn_head(feats)
        return rpn_proposals(scores, deltas, self.fpn_strides, image_shape,
                             nms_pre=cfg.rpn_nms_pre,
                             max_per_img=cfg.rpn_max_per_img,
                             iou_threshold=cfg.rpn_iou_threshold)

    def roi_forward(self, feats: Sequence[jnp.ndarray],
                    rois: jnp.ndarray, view_idx: jnp.ndarray,
                    differentiable: bool = False):
        """rois: [N, 4] image-pixel boxes; view_idx: [N].

        sampling_ratio=0 = mmcv adaptive ceil(bin) per RoI per axis, the
        reference extractor setting (maskrcnn_r50.py:40).

        differentiable=True (training) uses the XLA gather align (the Pallas
        patch-DMA kernel has no VJP yet); inference uses the kernel on TPU.
        """
        from ..ops import pallas_enabled
        if pallas_enabled() and not differentiable:
            from ..ops.pallas_roi_align import pallas_multilevel_roi_align
            roi_feats = pallas_multilevel_roi_align(
                list(feats[:4]), rois, view_idx, self.fpn_strides[:4],
                output_size=7, sampling_ratio=0)
        else:
            # chunk > R kills the lax.map while-loop: its AD-time copies /
            # pads / dynamic-update-slices cost more than the one-chunk
            # gather transient (RoIs are stop-gradient, so the gathered
            # cells are not live into the backward).
            # adaptive_max is map-derived (worst in-image roi spans the
            # finest level whole: ceil(extent / 7) cells/bin), so mmcv's
            # adaptive ceil(bin) sampling is EXACT here for every in-image
            # roi - the former default (9) silently clamped extreme-aspect
            # rois routed to level 0
            amax = max(-(-max(f.shape[1], f.shape[2]) // 7)
                       for f in feats[:4])
            roi_feats = multilevel_roi_align(
                list(feats[:4]), rois, view_idx, self.fpn_strides[:4],
                output_size=7, sampling_ratio=0, chunk=16384,
                adaptive_max=amax)
        return self.bbox_head(roi_feats)

    def roi_forward_views(self, feats: Sequence[jnp.ndarray],
                          rois_vp: jnp.ndarray):
        """R-CNN head on view-uniform TRAINING RoIs [V, S, 4] -> flat
        ([V*S, num_cls+1], [V*S, 4*num_cls]).

        On TPU this routes the slab align with its slab-resident custom
        VJP (backward = windowed VMEM accumulation, no scatter); the head
        runs in the kernel's compacted slot order and only the small
        logits/deltas are un-permuted."""
        from ..ops import pallas_enabled
        V, S = rois_vp.shape[:2]
        if pallas_enabled():
            from ..ops.pallas_roi_align import pallas_roi_align_views_train
            roi_feats, pos = pallas_roi_align_views_train(
                [f[:V] for f in feats[:4]], rois_vp, self.fpn_strides[:4],
                output_size=7, sampling_ratio=0)
            Pp = roi_feats.shape[1]
            cls_logits, deltas = self.bbox_head(
                roi_feats.reshape(V * Pp, *roi_feats.shape[2:]))
            cls_logits = jnp.take_along_axis(
                cls_logits.reshape(V, Pp, -1), pos[:, :, None], 1)
            deltas = jnp.take_along_axis(
                deltas.reshape(V, Pp, -1), pos[:, :, None], 1)
            return (cls_logits.reshape(V * S, -1),
                    deltas.reshape(V * S, -1))
        flat_rois = rois_vp.reshape(V * S, 4)
        view_idx = jnp.repeat(jnp.arange(V), S)
        return self.roi_forward(feats, flat_rois, view_idx,
                                differentiable=True)

    def detect(self, feats: Sequence[jnp.ndarray],
               image_shape: Tuple[int, int],
               cfg: DetectionProposalCfg) -> Proposals:
        """Full 2D detection -> padded per-view Proposals (the reference's
        simple_test_w_feat + process_2d_detections,
        wrap_detector.py:73-87 / mv2d.py:60-86)."""
        from ..ops import pallas_enabled
        V = feats[0].shape[0]
        prop_boxes, _, prop_valid = self.rpn(feats, image_shape, cfg)
        Rp = prop_boxes.shape[1]
        if pallas_enabled():
            # slab-resident per-view kernel (one slab DMA per view, patches
            # read straight from VMEM - per-RoI patch DMAs are segment-rate
            # bound and XLA gathers descriptor-rate bound)
            from ..ops.pallas_roi_align import pallas_roi_align_views
            # compacted slot order: the R-CNN head is per-roi, so it runs
            # on the kernel's bucket order and only the small logits /
            # deltas are un-permuted (the [V, P, 7, 7, C] un-permute
            # gather moves ~150 MB)
            roi_feats, pos = pallas_roi_align_views(
                list(feats[:4]), prop_boxes, self.fpn_strides[:4],
                output_size=7, sampling_ratio=0, compacted=True)
            Pp = roi_feats.shape[1]
            cls_logits, deltas = self.bbox_head(
                roi_feats.reshape(V * Pp, *roi_feats.shape[2:]))
            cls_logits = jnp.take_along_axis(
                cls_logits.reshape(V, Pp, -1), pos[:, :, None], 1)
            deltas = jnp.take_along_axis(
                deltas.reshape(V, Pp, -1), pos[:, :, None], 1)
        else:
            flat_rois = prop_boxes.reshape(V * Rp, 4)
            view_idx = jnp.repeat(jnp.arange(V), Rp)
            cls_logits, deltas = self.roi_forward(feats, flat_rois, view_idx)

        def decode_one(props, logits, dl, valid):
            boxes, scores = decode_detections(props, logits, dl, image_shape,
                                              self.num_classes)
            return multiclass_nms_2d(
                boxes, scores, valid, cfg.score_thr, cfg.iou_threshold,
                cfg.nms_pre, cfg.max_per_img,
                min_bbox_size=cfg.min_bbox_size)

        boxes, scores, labels, valid = jax.vmap(decode_one)(
            prop_boxes, cls_logits.reshape(V, Rp, -1),
            deltas.reshape(V, Rp, -1), prop_valid)
        return Proposals(boxes=boxes, scores=scores, labels=labels,
                         valid=valid)
