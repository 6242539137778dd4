"""Model/recipe presets mirroring the reference exp configs.

Reference configs (public API surface the rebuild mirrors):
  * mv2d_r50_frcnn_two_frames_1408x512_ep{24,72}   -> mv2d_t_r50()
  * mv2d_r50_frcnn_single_frame_roi_1408x512_ep{24,72} -> mv2d_s_r50()
(ref: configs/mv2d/exp/*.py)
"""
from __future__ import annotations

import dataclasses

from ..models.correlation import CorrelationConfig
from ..models.detector2d import DetectionProposalCfg
from ..models.mv2d import MV2DConfig

PROPOSAL_CFG = DetectionProposalCfg(score_thr=0.05, nms_pre=1000,
                                    max_per_img=75, iou_threshold=0.6,
                                    min_bbox_size=8.0)


def mv2d_t_r50(**overrides) -> MV2DConfig:
    """MV2D-T R50 two-frame 1408x512 (ref: ..._two_frames_1408x512_ep24.py)."""
    cfg = MV2DConfig(
        num_views=6, num_frames=2, image_size=(512, 1408), depth=50,
        stage_with_dcn=(False, False, True, True),
        key_mode='pixel', k_max=16384,
        correlation=CorrelationConfig.from_mode_string(
            'topk_matched:20:0.0:0.0', expand_stride=2.0),
        proposal_train=PROPOSAL_CFG, proposal_test=PROPOSAL_CFG,
        use_denoise=True, denoise_noise_scale=1.25, denoise_split=0.6,
        # Pallas masked flash attention for eval cross-attn (v5e: roi head
        # 44.3 -> 38.3 ms; training/dropout paths keep the XLA attention)
        use_flash_attention=True,
    )
    return cfg._replace(**overrides)


def mv2d_s_r50(**overrides) -> MV2DConfig:
    """MV2D-S R50 single-frame RoI-correlation 1408x512
    (ref: ..._single_frame_roi_1408x512_ep24.py: no DCN, no DN,
    correlation topk_matched:1)."""
    cfg = MV2DConfig(
        num_views=6, num_frames=1, image_size=(512, 1408), depth=50,
        stage_with_dcn=(False, False, False, False),
        key_mode='roi',
        correlation=CorrelationConfig.from_mode_string(
            'topk_matched:1:0.0:0.0', expand_stride=0.0),
        proposal_train=PROPOSAL_CFG, proposal_test=PROPOSAL_CFG,
        use_denoise=False,
    )
    return cfg._replace(**overrides)


def mv2d_t_r101(**overrides) -> MV2DConfig:
    """MV2D-T R101 two-frame 1600x640: the reference's R101 detector base
    (configs/mv2d/detectors/maskrcnn_r101.py) at the BASELINE.json stretch
    resolution; same head recipe as mv2d_t_r50."""
    cfg = mv2d_t_r50(depth=101, image_size=(640, 1600), k_max=24576)
    return cfg._replace(**overrides)


def mv2d_t_v99(**overrides) -> MV2DConfig:
    """MV2D-T VoVNet-99 (the registered-but-unused backbone family,
    ref models/backbones/vovnetcp.py) at the two-frame recipe."""
    cfg = mv2d_t_r50(backbone_type='vovnet', depth=99,
                     stage_with_dcn=(False,) * 4)
    return cfg._replace(**overrides)


def tiny(key_mode: str = 'pixel', num_frames: int = 1,
         **overrides) -> MV2DConfig:
    """Miniature config for tests / CPU dry-runs."""
    cfg = MV2DConfig(
        num_views=2, num_frames=num_frames, image_size=(64, 96), depth=10,
        stage_with_dcn=(False, False, False, False),
        embed_dims=32, depth_num=8, num_decoder_layers=2, num_heads=4,
        feedforward_channels=64, fpn_channels=32, rcnn_fc_channels=64,
        key_mode=key_mode, k_max=64, max_gt=4, denoise_scalar=3,
        correlation=CorrelationConfig(sample_size=2, num_depth=4, topk=2),
        proposal_train=DetectionProposalCfg(
            score_thr=0.05, nms_pre=32, max_per_img=6, min_bbox_size=0.0,
            rpn_nms_pre=64, rpn_max_per_img=32),
        proposal_test=DetectionProposalCfg(
            score_thr=0.05, nms_pre=32, max_per_img=6, min_bbox_size=0.0,
            rpn_nms_pre=64, rpn_max_per_img=32),
        max_num=20, max_per_scene=20,
    )
    return cfg._replace(**overrides)
