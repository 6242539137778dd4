"""MV2D / MV2D-T / MV2D-S: multi-view 2D-to-3D detector, single XLA program.

Re-implements the reference detectors (ref: models/detectors/mv2d.py:18-295,
mv2d_t.py:17-136) and RoI heads (models/roi_heads/mv2d_head.py:19-267,
mv2d_s_head.py:19-305, mv2d_t_head.py:19-142) as one fixed-shape forward:

  2D detector -> padded per-view proposals -> per-RoI virtual intrinsics ->
  RoIAlign(feat ++ 3DPE) -> query generator -> epipolar correlation ->
  bucketed key gather -> DN padding (train) -> sparse decoder ->
  per-layer (cls, code) -> NMS-free decode + cross-view BEV merge (eval).

Ragged structures of the reference map to fixed buckets:
  * detections: [V, P] slots (P = detection_proposal.max_per_img),
  * queries: R = V*P slots with validity, plus DN_PAD = denoise_scalar *
    max_gt noisy slots in training,
  * attention keys: K_MAX gathered active pixels (pixel mode) or
    [R, C*roi_area] correlated RoI features (roi mode).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..core import boxes as box_utils
from ..core.coder import nms_free_decode
from ..core.geometry import CameraParams, normalize_points, virtual_intrinsics
from ..core.nms import box3d_multiclass_nms
from .correlation import (CorrelationConfig, adjacency_from_correlation,
                          epipolar_in_box, gather_active_keys,
                          in_roi_pixel_masks, query_pixel_masks)
from .detector2d import DetectionProposalCfg, Proposals, TwoStageDetector
from ..nn.decoder import CrossAttentionBoxHead
from ..nn.fpn import FPN
from ..nn.pe import PE, padding_mask_at_feature_res
from ..nn.query_generator import QueryGenerator


class MV2DConfig(NamedTuple):
    num_views: int = 6            # views per frame
    num_frames: int = 2           # 2 = MV2D-T, 1 = MV2D / MV2D-S
    image_size: Tuple[int, int] = (512, 1408)   # (H, W) padded input
    depth: int = 50
    backbone_type: str = 'resnet'               # 'resnet' | 'vovnet'
    detector_type: str = 'two_stage'            # 'two_stage' | 'single_stage'
    stage_with_dcn: Tuple[bool, ...] = (False, False, True, True)
    frozen_stages: int = 1        # ref maskrcnn_r50.py:10 (stem + layer1)
    grad_all: bool = True         # ref MV2DT grad_all (mv2d_t.py:20):
                                  # False = no grad through history frames
    num_classes: int = 10
    embed_dims: int = 256
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    position_range: Tuple[float, ...] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    roi_size: int = 7
    stride: int = 16              # p4
    depth_num: int = 64           # PE depth bins
    with_fpe: bool = True
    key_mode: str = 'pixel'       # 'pixel' (MV2D/MV2D-T) or 'roi' (MV2D-S)
    k_max: int = 16384            # active-pixel key bucket (pixel mode)
    correlation: CorrelationConfig = CorrelationConfig(topk=20)
    proposal_train: DetectionProposalCfg = DetectionProposalCfg()
    proposal_test: DetectionProposalCfg = DetectionProposalCfg()
    num_decoder_layers: int = 6
    num_heads: int = 8
    feedforward_channels: int = 2048
    dropout: float = 0.1
    fpn_channels: int = 256
    rcnn_fc_channels: int = 1024
    # denoising (DN-DETR) training
    use_denoise: bool = True
    denoise_scalar: int = 10
    denoise_noise_scale: float = 1.25
    denoise_noise_trans: float = 0.0
    denoise_split: float = 0.6
    max_gt: int = 96              # GT bucket (DN groups are max_gt wide)
    max_gt2d: int = 64            # per-view 2D GT bucket (GT-complemented
                                  # proposal slots, so a model-shape bucket)
    # eval decoding
    max_num: int = 300            # NMS-free top-k per scene
    max_per_scene: int = 300
    bev_nms_thr: float = 1.0
    # training schedule knobs consumed by train/
    stage_loss_weights: Tuple[float, ...] = (0.1,) * 6
    complement_2d_gt: float = 0.4
    remat: bool = False
    # decoder-layer remat, separate from the backbone: with the flash
    # custom VJP the decoder's saved activations are tiny ([Q, C] per
    # layer - the kernel re-derives its own internals in the backward),
    # so rematting it only buys a full decoder forward recompute
    remat_decoder: bool = False
    use_flash_attention: bool = False   # Pallas kernel for eval cross-attn

    @property
    def total_views(self) -> int:
        return self.num_views * self.num_frames

    @property
    def dn_pad(self) -> int:
        return self.denoise_scalar * self.max_gt


@struct.dataclass
class GroundTruth3D:
    """Padded scene-level 3D GT (bottom-center boxes, lidar frame)."""
    boxes: jnp.ndarray    # [G, 9]
    labels: jnp.ndarray   # [G] int32
    valid: jnp.ndarray    # [G] bool


@struct.dataclass
class GroundTruth2D:
    """Padded per-view 2D GT (for the base detector + GT complement)."""
    boxes: jnp.ndarray    # [V, G2, 4] (x1, y1, x2, y2)
    labels: jnp.ndarray   # [V, G2] int32
    valid: jnp.ndarray    # [V, G2] bool


@struct.dataclass
class DNInfo:
    """Denoising-query bookkeeping for the loss (ref prepare_for_dn,
    mv2d_s_head.py:39-120)."""
    known_labels: jnp.ndarray   # [DN_PAD] int32 (num_classes = negative)
    known_boxes: jnp.ndarray    # [DN_PAD, 9] gravity-center boxes
    valid: jnp.ndarray          # [DN_PAD] bool
    num_gt: jnp.ndarray         # [] int32


@struct.dataclass
class ForwardOutputs:
    all_cls_scores: jnp.ndarray   # [L, R, num_classes] (match queries)
    all_bbox_preds: jnp.ndarray   # [L, R, 10]
    dn_cls_scores: Optional[jnp.ndarray]   # [L, DN_PAD, num_classes]
    dn_bbox_preds: Optional[jnp.ndarray]
    dn_info: Optional[DNInfo]
    query_valid: jnp.ndarray      # [R]
    proposals: Proposals
    # bucket-overflow accounting (scalars; see tools/calibrate_buckets.py):
    # key_active = pixels in the attention-key union, key_overflow = active
    # pixels dropped because they exceeded cfg.k_max (should be 0; resize
    # k_max if not), num_queries = valid proposal queries this scene
    diagnostics: Optional[dict] = None


DUMMY_BOX = (50.0, 50.0, 100.0, 100.0)


def _safe_boxes(boxes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    dummy = jnp.asarray(DUMMY_BOX, dtype=boxes.dtype)
    return jnp.where(valid[..., None], boxes, dummy)


class MV2D(nn.Module):
    cfg: MV2DConfig

    def setup(self):
        c = self.cfg
        if c.detector_type == 'single_stage':
            # ref SingleStageDetBase (wrap_detector.py:7-33): swap-in
            # single-stage 2D detector family
            from .detector2d import SingleStageDetector
            self.base_detector = SingleStageDetector(
                depth=c.depth, num_classes=c.num_classes,
                backbone_type=c.backbone_type,
                stage_with_dcn=c.stage_with_dcn,
                frozen_stages=c.frozen_stages,
                fpn_channels=c.fpn_channels, remat=c.remat)
        else:
            self.base_detector = TwoStageDetector(
                depth=c.depth, num_classes=c.num_classes,
                backbone_type=c.backbone_type,
                stage_with_dcn=c.stage_with_dcn, fpn_channels=c.fpn_channels,
                frozen_stages=c.frozen_stages,
                rcnn_fc_channels=c.rcnn_fc_channels, remat=c.remat)
        # neck: p4-selecting FPN-on-FPN (ref ..._ep24.py:32-39)
        self.neck = FPN(out_channels=c.embed_dims, num_outs=1,
                        start_level=2, end_level=2)
        self.pe = PE(embed_dims=c.embed_dims, depth_num=c.depth_num,
                     position_range=c.position_range, with_fpe=c.with_fpe,
                     stride=c.stride,
                     num_sine_feats=c.embed_dims // 2)
        # widths scale with embed_dims; defaults reproduce the reference
        # (conv 256, fc 1024, extra (512, 256), ..._ep24.py:100-112)
        self.query_generator = QueryGenerator(
            in_channels=c.embed_dims, conv_out_channels=c.embed_dims,
            fc_out_channels=c.embed_dims * 4,
            extra_channels=(c.embed_dims * 2, c.embed_dims))
        self.bbox_head = CrossAttentionBoxHead(
            num_classes=c.num_classes, embed_dims=c.embed_dims,
            num_layers=c.num_decoder_layers, num_heads=c.num_heads,
            feedforward_channels=c.feedforward_channels, dropout=c.dropout,
            pc_range=c.pc_range, remat=c.remat_decoder,
            use_flash=c.use_flash_attention)

    # ------------------------------------------------------------ features

    def extract_feats(self, imgs: jnp.ndarray, fast_inference: bool = False):
        """imgs: [V, H, W, 3] -> (fpn p2..p6, neck p4).

        fast_inference routes DCN blocks through the no-grad Pallas band
        kernel (inference / no-grad feature paths only)."""
        fpn_feats = self.base_detector.extract_feat(imgs, fast_inference)
        p4 = self.neck(fpn_feats)[0]
        return fpn_feats, p4

    # ------------------------------------------------------------- dn prep

    def _prepare_dn(self, gt: GroundTruth3D, rng: jax.Array):
        c = self.cfg
        G = c.max_gt
        S = c.denoise_scalar
        assert gt.boxes.shape[0] == G, (
            f'GT bucket {gt.boxes.shape[0]} must equal cfg.max_gt {G} '
            f'(DN group width); size the dataset buckets from the model '
            f'config')
        centers = box_utils.bottom_to_gravity(gt.boxes)[:, :3]   # gravity xyz
        sizes = gt.boxes[:, 3:6]
        centers = jnp.tile(centers, (S, 1))                      # [S*G, 3]
        sizes = jnp.tile(sizes, (S, 1))
        labels = jnp.tile(gt.labels, (S,))
        valid = jnp.tile(gt.valid, (S,))
        rand = jax.random.uniform(rng, (S * G, 3), minval=-1.0, maxval=1.0)
        diff = sizes / 2 + c.denoise_noise_trans
        noisy = centers + rand * diff * c.denoise_noise_scale
        noisy = normalize_points(noisy, c.pc_range)
        eps = 1e-4
        noisy = jnp.clip(noisy, eps, 1.0 - eps)
        neg = jnp.linalg.norm(rand, axis=1) > c.denoise_split
        labels = jnp.where(neg, c.num_classes, labels)
        gravity_boxes = box_utils.bottom_to_gravity(gt.boxes)
        info = DNInfo(known_labels=labels.astype(jnp.int32),
                      known_boxes=jnp.tile(gravity_boxes, (S, 1)),
                      valid=valid, num_gt=gt.valid.sum().astype(jnp.int32))
        return noisy, info

    def _dn_self_mask(self, match_valid: jnp.ndarray,
                      dn_valid: jnp.ndarray) -> jnp.ndarray:
        """Allowed mask [Q, Q] (ref attn_mask construction,
        mv2d_s_head.py:92-104, inverted to 'allowed')."""
        c = self.cfg
        P, G = c.dn_pad, c.max_gt
        Q = P + match_valid.shape[0]
        gid = jnp.arange(Q) // G        # DN group id; match queries >= S
        is_dn = jnp.arange(Q) < P
        allowed = jnp.ones((Q, Q), dtype=bool)
        # match queries cannot see DN queries
        allowed &= ~(~is_dn[:, None] & is_dn[None, :])
        # DN queries see only their own group among DN queries
        same_group = gid[:, None] == gid[None, :]
        dn_pair = is_dn[:, None] & is_dn[None, :]
        allowed &= ~(dn_pair & ~same_group)
        # padded (invalid) slots are masked out as self-attn KEYS: the
        # reference's ragged query set never contains them, so garbage
        # dummy-slot values must not leak into valid queries.  The
        # diagonal stays allowed so no row is ever fully masked.
        col_valid = jnp.concatenate([dn_valid, match_valid])
        allowed &= col_valid[None, :]
        return allowed | jnp.eye(Q, dtype=bool)

    def _match_self_mask(self, match_valid: jnp.ndarray) -> jnp.ndarray:
        """Non-DN self-attn mask: only VALID queries act as keys (the
        reference folds exactly the real detections into its global
        self-attention, petr_transformer.py:346-351 - padded slots must
        not perturb them); diagonal kept to avoid fully-masked rows."""
        R = match_valid.shape[0]
        return match_valid[None, :] | jnp.eye(R, dtype=bool)

    # ----------------------------------------------------------- main head

    def roi_head_forward(self, p4: jnp.ndarray, pos: jnp.ndarray,
                         proposals: Proposals, cam: CameraParams,
                         img_shapes: jnp.ndarray,
                         gt: Optional[GroundTruth3D] = None,
                         dn_rng: Optional[jax.Array] = None,
                         deterministic: bool = True,
                         mean_time_delta: Optional[jnp.ndarray] = None):
        c = self.cfg
        V, h, w, C = p4.shape
        P = proposals.boxes.shape[1]
        R = V * P
        boxes = _safe_boxes(proposals.boxes, proposals.valid)    # [V, P, 4]
        flat_boxes = boxes.reshape(R, 4)
        flat_valid = proposals.valid.reshape(R)
        view_idx = jnp.repeat(jnp.arange(V), P)

        # per-RoI virtual intrinsics (fp32 islands)
        Kv = virtual_intrinsics(flat_boxes.astype(jnp.float32),
                                cam.intrinsics[view_idx],
                                (c.roi_size, c.roi_size))
        wh = flat_boxes[:, 2:4] - flat_boxes[:, 0:2]
        intrins_ok = jnp.all(wh >= 4.0, axis=1) & flat_valid

        # RoIAlign on feat ++ 3dpe (ref mv2d_head.py:114-119); chunked so the
        # training-path gather transient stays bounded
        # Separable two-matmul align over the shared p4 tile (4.6 ms vs
        # 18.6 ms gather / 23.9 ms slab kernel at 900 RoIs x 512 ch, see
        # docs/PERF.md).  Exact roi_align semantics; differentiable with a
        # dense-matmul backward (the gather align's backward is a
        # descriptor-bound scatter-add), so training uses it too - the
        # AD-kept [V, P, O, H, C] transient is ~200 MB at recipe shapes.
        cat = jnp.concatenate([p4, pos], axis=-1)
        from ..ops.roi_align import separable_roi_align_views
        # sampling_ratio=-1 = mmcv adaptive ceil(bin) samples per axis (ref
        # bbox_roi_extractor at ..._ep24.py:51); per-axis slot caps at the
        # map extent's true worst case (ceil(512/16/7) = 5 rows,
        # ceil(1408/16/7) = 13 cols) keep it EXACT for every in-image RoI
        # while the weight-build lattice stays minimal
        amax = (-(-p4.shape[1] // c.roi_size), -(-p4.shape[2] // c.roi_size))
        roi_feats = separable_roi_align_views(
            cat, boxes, 1.0 / c.stride, c.roi_size, sampling_ratio=-1,
            adaptive_max=amax)
        roi_feats = roi_feats.reshape(R, c.roi_size, c.roi_size,
                                      cat.shape[-1])
        bbox_feats, roi_pe = jnp.split(roi_feats, 2, axis=-1)

        ref_pts, _ = self.query_generator(bbox_feats, Kv,
                                          cam.ext_t_inv[view_idx], intrins_ok)
        ref_pts = normalize_points(ref_pts, c.pc_range)          # [R, 3]

        # epipolar correlation (detached geometry)
        corr_ids, corr_mask = epipolar_in_box(
            jax.lax.stop_gradient(boxes), proposals.valid, cam.trans_mats,
            c.image_size, c.correlation)

        pad_mask = padding_mask_at_feature_res(img_shapes, c.image_size,
                                               (h, w))           # [V, h, w]
        use_dn = c.use_denoise and gt is not None and dn_rng is not None

        if c.key_mode == 'pixel':
            in_roi = in_roi_pixel_masks(boxes, proposals.valid, (h, w),
                                        c.stride, c.correlation.expand_stride)
            A = adjacency_from_correlation(corr_ids, corr_mask, R)
            # union needs no matmul: pixel (v, i) is active iff it lies in
            # any roi that SOME query correlates to - and the per-query
            # mask matmul only needs the k_max gathered key columns, not
            # all V*h*w (saves the [R, V*hw] f32 intermediate)
            qact = A.any(axis=0).reshape(V, P)
            union = (in_roi & qact[:, :, None]).any(axis=1).reshape(-1)
            if not deterministic:
                # training fake-key trick (ref mv2d_head.py:157-159):
                # queries whose correlation pixel mask is empty attend to
                # feature pixel (view 0, y 0, x 0) instead of nothing,
                # which also forces that pixel into the gathered union
                roi_has_pix = in_roi.any(-1).reshape(R)
                empty_q = ~(A & roi_has_pix[None]).any(-1)       # [R]
                union = union.at[0].set(union[0] | empty_q.any())
            n_active = union.sum().astype(jnp.int32)
            key_overflow = jnp.maximum(n_active - c.k_max, 0)
            key_idx, key_active = gather_active_keys(union, c.k_max)
            key_ok = key_active & ~pad_mask.reshape(-1)[key_idx]
            keys = p4.reshape(V * h * w, C)[key_idx]
            key_pos = pos.reshape(V * h * w, C)[key_idx]
            vk = key_idx // (h * w)
            ik = key_idx % (h * w)
            G = in_roi[:, :, ik] & (jnp.arange(V)[:, None, None]
                                    == vk[None, None, :])        # [V, P, K]
            hits = jnp.einsum('rvp,vpk->rk',
                              A.reshape(R, V, P).astype(jnp.bfloat16),
                              G.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            cross = (hits > 0.5) & key_ok[None]                  # [R, K]
            if not deterministic:
                fake_col = (key_idx == 0) & key_active
                cross = cross | (empty_q[:, None] & fake_col[None])
        elif use_dn:  # roi mode + DN (ref mv2d_s_head.py:158-180)
            # keys = ALL rois' 7x7 features as one shared set; real
            # queries see only their correlated rois' pixels (the
            # scatter-built cross_attn_mask), DN rows see every valid roi
            # (cross_attn_mask_pad = zeros)
            area = c.roi_size * c.roi_size
            A = adjacency_from_correlation(corr_ids, corr_mask, R)
            keys = bbox_feats.reshape(R * area, C)
            key_pos = roi_pe.reshape(R * area, C)
            cross = jnp.repeat(A, area, axis=1)                  # [R, R*A]
        else:  # roi mode (MV2D-S, ref mv2d_s_head.py:184-192)
            Ccorr = corr_ids.shape[1]
            area = c.roi_size * c.roi_size
            kf = bbox_feats.reshape(R, area, C)[corr_ids]        # [R, Cc, A, C]
            kp = roi_pe.reshape(R, area, C)[corr_ids]
            keys = kf.reshape(R, Ccorr * area, C)
            key_pos = kp.reshape(R, Ccorr * area, C)
            cross = jnp.repeat(corr_mask, area, axis=1)          # [R, Cc*A]

        if use_dn:
            noisy_refs, dn_info = self._prepare_dn(gt, dn_rng)
            refs_all = jnp.concatenate([noisy_refs, ref_pts], axis=0)
            self_allowed = self._dn_self_mask(flat_valid, dn_info.valid)
            if c.key_mode == 'pixel':
                dn_cross = jnp.broadcast_to((union[key_idx] & key_ok)[None],
                                            (c.dn_pad, cross.shape[1]))
            else:
                # DN rows attend to every VALID roi's pixels
                dn_cross = jnp.broadcast_to(
                    jnp.repeat(flat_valid, c.roi_size * c.roi_size)[None],
                    (c.dn_pad, cross.shape[1]))
            cross_all = jnp.concatenate([dn_cross, cross], axis=0)
        else:
            dn_info = None
            refs_all = ref_pts
            self_allowed = self._match_self_mask(flat_valid)
            cross_all = cross

        all_cls, all_box = self.bbox_head(refs_all, keys, key_pos,
                                          self_allowed, cross_all,
                                          deterministic)
        if mean_time_delta is not None:
            # temporal: velocities regressed per time delta
            # (ref mv2d_t_head.py:130-142)
            scale = 1.0 / mean_time_delta
            all_box = all_box.at[..., 8:10].multiply(scale)

        if use_dn:
            dn_cls = all_cls[:, :c.dn_pad]
            dn_box = all_box[:, :c.dn_pad]
            all_cls = all_cls[:, c.dn_pad:]
            all_box = all_box[:, c.dn_pad:]
        else:
            dn_cls = dn_box = None

        if c.key_mode == 'pixel':
            diagnostics = {'key_active': n_active,
                           'key_overflow': key_overflow,
                           'num_queries': flat_valid.sum().astype(jnp.int32)}
        else:
            diagnostics = {'num_queries': flat_valid.sum().astype(jnp.int32)}
        return ForwardOutputs(
            all_cls_scores=all_cls, all_bbox_preds=all_box,
            dn_cls_scores=dn_cls, dn_bbox_preds=dn_box, dn_info=dn_info,
            query_valid=flat_valid, proposals=proposals,
            diagnostics=diagnostics)

    # ----------------------------------------------------------- inference

    def _mean_time_delta(self, cam: CameraParams):
        c = self.cfg
        if c.num_frames < 2:
            return None
        ts = cam.timestamps
        delta = ts[c.num_views:].mean() - ts[:c.num_views].mean()
        # guard: synthetic data may carry zero timestamps
        return jnp.where(jnp.abs(delta) < 1e-6, 1.0, delta)

    def __call__(self, imgs: jnp.ndarray, cam: CameraParams,
                 img_shapes: jnp.ndarray):
        """Inference: [V, H, W, 3] images -> scene-level 3D detections.

        Returns (boxes [max_per_scene, 9] bottom-center, scores, labels,
        valid)."""
        c = self.cfg
        fpn_feats, p4 = self.extract_feats(imgs, fast_inference=True)
        proposals = self.base_detector.detect(fpn_feats, c.image_size,
                                              c.proposal_test)
        pos = self.pe(p4, cam.img2lidar, img_shapes, c.image_size)
        out = self.roi_head_forward(
            p4, pos, proposals, cam, img_shapes,
            mean_time_delta=self._mean_time_delta(cam))
        cls_scores = out.all_cls_scores[-1]
        bbox_preds = out.all_bbox_preds[-1]
        boxes, scores, labels, valid = nms_free_decode(
            cls_scores, bbox_preds, out.query_valid, c.max_num,
            c.num_classes, c.position_range)
        # gravity -> bottom center (ref cross_attention_head.py:372)
        boxes = box_utils.gravity_to_bottom(boxes)
        # cross-view merge (ref mv2d.py:265-282); thr=1.0 => dedup-free top-k
        scores_mc = jax.nn.one_hot(labels, c.num_classes + 1,
                                   dtype=scores.dtype) * scores[:, None]
        bev = jnp.stack([boxes[:, 0], boxes[:, 1], boxes[:, 3], boxes[:, 4],
                         boxes[:, 6]], axis=-1)
        return box3d_multiclass_nms(boxes, bev, scores_mc, valid, 0.0,
                                    c.max_per_scene, c.bev_nms_thr,
                                    c.num_classes)

    def forward_train_head(self, imgs: jnp.ndarray, cam: CameraParams,
                           img_shapes: jnp.ndarray, proposals: Proposals,
                           gt: GroundTruth3D, dn_rng: jax.Array,
                           deterministic: bool = False) -> ForwardOutputs:
        """3D-head training forward given externally assembled proposals
        (detections complemented with missed GT, ref mv2d.py:198-203)."""
        c = self.cfg
        fpn_feats, p4 = self.extract_feats(imgs)
        pos = self.pe(p4, cam.img2lidar, img_shapes, c.image_size)
        return self.roi_head_forward(
            p4, pos, proposals, cam, img_shapes, gt=gt, dn_rng=dn_rng,
            deterministic=deterministic,
            mean_time_delta=self._mean_time_delta(cam))

    # --------------------------------------------------------- full training

    def complement_2d_gt(self, proposals: Proposals,
                         gt2d: GroundTruth2D) -> Proposals:
        """Append GT boxes the detector missed (max IoU < thr) as proposals
        (ref: mv2d.py:104-117, thr = train_cfg complement_2d_gt = 0.4)."""
        c = self.cfg
        iou = box_utils.box_iou_xyxy(gt2d.boxes, proposals.boxes)  # [V,G2,P]
        iou = jnp.where(proposals.valid[:, None, :], iou, 0.0)
        missed = iou.max(-1) < c.complement_2d_gt
        wh = gt2d.boxes[..., 2:4] - gt2d.boxes[..., 0:2]
        big_enough = jnp.all(
            wh >= c.proposal_train.min_bbox_size, axis=-1)
        comp_valid = gt2d.valid & missed & big_enough
        boxes = jnp.concatenate([proposals.boxes, gt2d.boxes], axis=1)
        valid = jnp.concatenate([proposals.valid, comp_valid], axis=1)
        scores = jnp.concatenate(
            [proposals.scores, jnp.ones_like(gt2d.boxes[..., 0])], axis=1)
        labels = jnp.concatenate([proposals.labels, gt2d.labels], axis=1)
        return Proposals(boxes=boxes, scores=scores, labels=labels,
                         valid=valid)

    def forward_train(self, imgs: jnp.ndarray, cam: CameraParams,
                      img_shapes: jnp.ndarray, gt2d: GroundTruth2D,
                      gt3d: GroundTruth3D):
        """Full training forward (ref: MV2D.forward_train, mv2d.py:129-213 /
        MV2DT, mv2d_t.py:27-119).

        Returns (head_outputs: ForwardOutputs, detector2d_raw: dict) - losses
        are assembled in train/train_step.py.
        """
        from ..ops.grid_mask import grid_mask as grid_mask_fn
        c = self.cfg
        imgs = grid_mask_fn(self.make_rng('aug'), imgs)
        fpn_feats, p4 = self.extract_feats(imgs)
        Vc = c.num_views
        if not c.grad_all and c.num_frames > 1:
            # ref MV2DT grad_all=False (mv2d_t.py:86-94): history frames'
            # features are extracted under no_grad; same values, so a
            # stop_gradient on the history slice is the exact equivalent
            # and DCEs their backbone/FPN backward
            fpn_feats = tuple(
                jnp.concatenate(
                    [f[:Vc], jax.lax.stop_gradient(f[Vc:])], axis=0)
                for f in fpn_feats)
            p4 = jnp.concatenate(
                [p4[:Vc], jax.lax.stop_gradient(p4[Vc:])], axis=0)

        # ---- 2D detector raw outputs for the 2D losses: the reference
        # runs the loss head on the CURRENT frame only
        # (forward_train_w_feat(detector_feat_current), mv2d_t.py:97-105);
        # running it on all V views computed 2x the head convs + their
        # backward for outputs the loss slices away
        cur_feats = [f[:Vc] for f in fpn_feats]
        if c.detector_type == 'single_stage':
            rpn_scores, rpn_deltas = self.base_detector.retina_head(cur_feats)
        else:
            rpn_scores, rpn_deltas = self.base_detector.rpn_head(cur_feats)

        # ---- no-grad 2D detections -> proposals (+ GT complement)
        feats_sg = tuple(jax.lax.stop_gradient(f) for f in fpn_feats)
        proposals = self.base_detector.detect(feats_sg, c.image_size,
                                              c.proposal_train)
        # the reference computes detections under torch.no_grad()
        # (mv2d.py:110-113): stop EVERY output, not just the feats - the
        # box coordinates otherwise leak cotangents back through the
        # detect pass's NMS/R-CNN/RPN via the 3D head's RoIAlign and
        # virtual intrinsics (a full detect backward in the profile:
        # ~10+ ms/step of transposed convs + loop fusions for gradients
        # the reference never computes)
        proposals = jax.tree.map(jax.lax.stop_gradient, proposals)
        proposals = self.complement_2d_gt(proposals, gt2d)

        # ---- 3D head
        pos = self.pe(p4, cam.img2lidar, img_shapes, c.image_size)
        out = self.roi_head_forward(
            p4, pos, proposals, cam, img_shapes, gt=gt3d,
            dn_rng=self.make_rng('dn'), deterministic=False,
            mean_time_delta=self._mean_time_delta(cam))
        det_raw = dict(fpn_feats=fpn_feats, rpn_scores=rpn_scores,
                       rpn_deltas=rpn_deltas)
        return out, det_raw

    def rcnn_train_forward(self, fpn_feats, rois_vp: jnp.ndarray):
        """RCNN head on sampled training RoIs, rois_vp [V, S, 4]
        (differentiable align: slab Pallas kernel with the scatter-free
        custom VJP on TPU, XLA gather elsewhere)."""
        return self.base_detector.roi_forward_views(fpn_feats, rois_vp)
