"""Epipolar box correlation (fixed-shape, TPU-native).

Re-implements BoxCorrelation (ref: models/roi_heads/utils/
box_correlation.py:11-399) without any ragged tensors:

  * proposals live in [V, P] padded slots; the correlation output is a fixed
    [R, 1 + V*topk] table of global roi ids + validity (R = V*P),
  * the reference's per-query pixel masks (gen_box_correlation:95-162, built
    with pad_sequence + a bucketed gather loop) become per-view boolean
    matmuls on the MXU: adjacency[R, P_v] @ in_roi_pixels[P_v, h*w],
  * the ragged "valid pixel gather" (mv2d_head.py:161-165) becomes a fixed
    K_MAX-bucket stable-sort gather of active pixel indices.

Everything here is geometry on detached inputs (@no_grad in the reference).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.boxes import box_iou_xyxy
from ..core.geometry import lid_depth_bins


class CorrelationConfig(NamedTuple):
    sample_size: int = 4
    num_depth: int = 8
    depth_start: float = 0.5
    depth_end: float = 70.0
    lid: bool = True
    mode: str = 'topk_matched'    # 'topk_matched' | 'all_matched'
    topk: int = 20
    iou_thr: float = 0.0
    ratio: float = 0.0
    expand_stride: float = 2.0

    @classmethod
    def from_mode_string(cls, mode: str, **kw) -> "CorrelationConfig":
        """Parse the reference's 'topk_matched:K:iou_thr:ratio' /
        'all_matched' strings (ref box_correlation.py:305-382)."""
        parts = mode.split(':')
        if parts[0] == 'all_matched':
            return cls(mode='all_matched', **kw)
        assert parts[0] == 'topk_matched', f'unsupported mode {mode}'
        return cls(mode='topk_matched', topk=int(parts[1]),
                   iou_thr=float(parts[2]), ratio=float(parts[3]), **kw)


def _sample_points_in_boxes(boxes: jnp.ndarray, n: int) -> jnp.ndarray:
    """boxes: [R, 4] -> [R, n*n, 2] grid points incl. corners
    (ref: gen_sample_points_in_rois, box_correlation.py:196-209)."""
    t = jnp.linspace(0.0, 1.0, n)
    gy, gx = jnp.meshgrid(t, t, indexing='ij')
    grid = jnp.stack([gx, gy], -1).reshape(-1, 2)            # [n*n, 2]
    wh = boxes[:, 2:4] - boxes[:, 0:2]
    return boxes[:, None, 0:2] + wh[:, None] * grid[None]


def epipolar_in_box(boxes: jnp.ndarray, valid: jnp.ndarray,
                    trans_mats: jnp.ndarray, pad_shape: Tuple[int, int],
                    cfg: CorrelationConfig
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape epipolar matching.

    boxes: [V, P, 4]; valid: [V, P]; trans_mats: [V, V, 4, 4]
    (trans_mats[i, j] maps view-i image points to view-j image points).
    Returns (corr_ids [R, 1 + V*topk] global roi indices,
             corr_mask [R, 1 + V*topk]) with column 0 = self.
    """
    V, P = boxes.shape[:2]
    R = V * P
    S = cfg.sample_size * cfg.sample_size
    D = cfg.num_depth
    flat_boxes = boxes.reshape(R, 4)
    flat_valid = valid.reshape(R)
    view_of_roi = jnp.repeat(jnp.arange(V), P)

    pts = _sample_points_in_boxes(flat_boxes, cfg.sample_size)   # [R, S, 2]
    if cfg.lid:
        depths = lid_depth_bins(cfg.depth_start, cfg.depth_end, D)
    else:
        depths = jnp.linspace(cfg.depth_start, cfg.depth_end, D)
    # camera-frame homogeneous points (u*d, v*d, d, 1): [R, S, D, 4]
    uv = pts[:, :, None, :]
    d = depths[None, None, :, None]
    hom = jnp.concatenate([uv * d, jnp.broadcast_to(d, (R, S, D, 1)),
                           jnp.ones((R, S, D, 1), dtype=boxes.dtype)], -1)
    tm = trans_mats[view_of_roi]                                  # [R, V, 4, 4]
    proj = jnp.einsum('rvij,rsdj->rvsdi', tm, hom)
    depth_t = proj[..., 2]
    uv_t = proj[..., :2] / jnp.maximum(depth_t[..., None], 1e-2)
    ok = depth_t >= cfg.depth_start                               # [R, V, S, D]
    H, W = pad_shape
    ok &= (uv_t[..., 0] >= 0) & (uv_t[..., 0] <= W - 1)
    ok &= (uv_t[..., 1] >= 0) & (uv_t[..., 1] <= H - 1)
    own = jax.nn.one_hot(view_of_roi, V, dtype=bool)
    ok &= ~own[:, :, None, None]
    ok &= flat_valid[:, None, None, None]

    # membership of epipolar points in target-view boxes: [R, V, P]
    pts_flat = uv_t.reshape(R, V, S * D, 2)
    ok_flat = ok.reshape(R, V, S * D)
    b = boxes[None, :, :, None]                                   # [1,V,P,1,4]
    inb = (pts_flat[:, :, None, :, 0] >= b[..., 0]) & \
          (pts_flat[:, :, None, :, 0] <= b[..., 2]) & \
          (pts_flat[:, :, None, :, 1] >= b[..., 1]) & \
          (pts_flat[:, :, None, :, 1] <= b[..., 3])
    inb &= ok_flat[:, :, None, :]
    in_rois = inb.any(-1) & valid[None]                           # [R, V, P]
    in_view = in_rois.any(-1)                                     # [R, V]

    # hull of valid epipolar points per (roi, view) -> iou vs target boxes
    big = jnp.asarray(1e4, boxes.dtype)
    pmax = jnp.where(ok_flat[..., None], pts_flat, -big).max(2)   # [R, V, 2]
    pmin = jnp.where(ok_flat[..., None], pts_flat, big).min(2)
    hull = jnp.concatenate([pmin, pmax], -1)                      # [R, V, 4]
    iou = box_iou_xyxy(hull[:, :, None], boxes[None])[:, :, 0]    # [R, V, P]
    iou = jnp.where(valid[None] & in_view[..., None], iou, 0.0)

    if cfg.mode == 'all_matched':
        # every box with positive hull-IoU correlates (ref 'all_matched',
        # box_correlation.py:305-335: all_mask = iou > 0 over matched
        # views); fixed-shape form = the full [R, V*P] table.  The table
        # is O(R^2) - fine for the correlation itself, but roi-mode
        # per-query key gathers scale with it; shipped recipes all use
        # topk_matched.
        top_ids = jnp.broadcast_to(
            jnp.arange(R, dtype=jnp.int32)[None], (R, R))
        top_mask = (iou > 0).reshape(R, R)
    else:
        k = min(cfg.topk, P)
        # NOTE: topk_small_exact (argmax scan) measured SLOWER here on real
        # TPU (2.45 ms scan vs 1.46 ms sort in the eval device profile) -
        # the k-step while loop overhead dominates at this shape
        top_iou, top_idx = jax.lax.top_k(iou, k)                  # [R, V, k]
        top_ids = jnp.arange(V)[None, :, None] * P + top_idx      # global ids
        top_max = top_iou.max(-1, keepdims=True)
        top_mask = ((top_iou > cfg.ratio * top_max) |
                    (top_iou > cfg.iou_thr)) & (top_iou > 0)
        top_ids = top_ids.reshape(R, V * k)
        top_mask = top_mask.reshape(R, V * k)

    self_ids = jnp.arange(R, dtype=top_ids.dtype)[:, None]
    corr_ids = jnp.concatenate([self_ids, top_ids], axis=1)
    corr_mask = jnp.concatenate([flat_valid[:, None], top_mask], axis=1)
    return corr_ids, corr_mask


def adjacency_from_correlation(corr_ids: jnp.ndarray, corr_mask: jnp.ndarray,
                               num_rois: int) -> jnp.ndarray:
    """[R, C] id/mask table -> dense adjacency [R, R] bool.

    Dense compare-any instead of a scatter: the [R, C, R] broadcast
    compare fuses into one VPU loop over output tiles (~195M compares at
    R=900), while the scatter (216900 updates into [900, 900]) ran as a
    ~2 ms descriptor-bound custom fusion in the eval device profile.
    """
    ids = jnp.where(corr_mask, corr_ids, -1)
    return (ids[:, :, None] ==
            jnp.arange(num_rois, dtype=ids.dtype)[None, None, :]).any(1)


def in_roi_pixel_masks(boxes: jnp.ndarray, valid: jnp.ndarray,
                       feat_hw: Tuple[int, int], stride: float,
                       expand_stride: float) -> jnp.ndarray:
    """Per-view in-box pixel masks: [V, P, h*w] bool.

    Pixel (y, x) maps to image coords ((x+0.5)*stride-0.5, ...) and is inside
    iff its (expand_stride+0.5)*stride neighbourhood overlaps the box
    (ref: gen_box_correlation, box_correlation.py:102-113)."""
    h, w = feat_hw
    xs = (jnp.arange(w, dtype=boxes.dtype) + 0.5) * stride - 0.5
    ys = (jnp.arange(h, dtype=boxes.dtype) + 0.5) * stride - 0.5
    m = (expand_stride + 0.5) * stride
    in_x = (xs[None, None] + m >= boxes[..., 0:1]) & \
           (xs[None, None] - m <= boxes[..., 2:3])             # [V, P, w]
    in_y = (ys[None, None] + m >= boxes[..., 1:2]) & \
           (ys[None, None] - m <= boxes[..., 3:4])             # [V, P, h]
    mask = in_y[:, :, :, None] & in_x[:, :, None, :]           # [V, P, h, w]
    mask &= valid[..., None, None]
    return mask.reshape(*boxes.shape[:2], h * w)


def query_pixel_masks(adjacency: jnp.ndarray, in_roi: jnp.ndarray
                      ) -> jnp.ndarray:
    """Per-query allowed-pixel masks via per-view boolean matmul.

    adjacency: [R, R] (R = V*P), in_roi: [V, P, hw].
    Returns [R, V*hw] bool: pixel allowed iff inside any correlated roi of
    that view."""
    V, P, hw = in_roi.shape
    R = adjacency.shape[0]
    A = adjacency.reshape(R, V, P).astype(jnp.float32)
    F = in_roi.astype(jnp.float32)
    M = jnp.einsum('rvp,vph->rvh', A, F,
                   preferred_element_type=jnp.float32)         # [R, V, hw]
    return (M > 0.5).reshape(R, V * hw)


def gather_active_keys(union_mask: jnp.ndarray, k_max: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable fixed-size gather of active pixel indices.

    union_mask: [N] bool -> (indices [k_max] int32, valid [k_max]).
    Replaces the reference's ragged valid-pixel gather (mv2d_head.py:161-165)
    with a bucket; if more than k_max pixels are active the overflow is
    dropped (choose k_max generously; see models/mv2d.py)."""
    order = jnp.argsort(~union_mask, stable=True)
    idx = order[:k_max].astype(jnp.int32)
    return idx, union_mask[idx]
