"""Pure-function 3D/2D box utilities.

Re-implements (TPU-native, fixed-shape) the reference's box code helpers:
  * normalize_bbox / denormalize_bbox    (ref: mmdet3d_plugin/core/bbox/util.py:38,60)
  * pairwise axis-aligned IoU            (ref: models/detectors/mv2d.py:89-102)
  * rotated BEV IoU via polygon clipping (ref: external mmdet3d iou3d CUDA op,
    called through box3d_multiclass_nms at models/detectors/mv2d.py:277)

Box conventions (match the reference / nuScenes LiDAR frame):
  * 3D box tensor: (cx, cy, cz_bottom, w, l, h, yaw[, vx, vy]) - z is the
    BOTTOM center, as in mmdet3d LiDARInstance3DBoxes.
  * "gravity" boxes: (cx, cy, cz_center, w, l, h, yaw[, vx, vy]) - z is the
    geometric center; losses/matching operate on gravity boxes.
  * normalized code (10-dim): (cx, cy, log w, log l, cz, log h, sin yaw,
    cos yaw, vx, vy).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_bbox(bboxes: jnp.ndarray) -> jnp.ndarray:
    """Gravity-center 3D boxes (..., 9 or 7) -> normalized code (..., 10 or 8)."""
    cx = bboxes[..., 0:1]
    cy = bboxes[..., 1:2]
    cz = bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(code: jnp.ndarray) -> jnp.ndarray:
    """Normalized code (..., >=8) -> gravity-center 3D boxes (..., 9 or 7)."""
    rot = jnp.arctan2(code[..., 6:7], code[..., 7:8])
    cx = code[..., 0:1]
    cy = code[..., 1:2]
    cz = code[..., 4:5]
    w = jnp.exp(code[..., 2:3])
    l = jnp.exp(code[..., 3:4])
    h = jnp.exp(code[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if code.shape[-1] > 8:
        parts += [code[..., 8:9], code[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)


def gravity_to_bottom(boxes: jnp.ndarray) -> jnp.ndarray:
    """z center -> z bottom (ref: cross_attention_head.py:372)."""
    return boxes.at[..., 2].add(-0.5 * boxes[..., 5])


def bottom_to_gravity(boxes: jnp.ndarray) -> jnp.ndarray:
    """z bottom -> z center (ref: LiDARInstance3DBoxes.gravity_center)."""
    return boxes.at[..., 2].add(0.5 * boxes[..., 5])


def box_iou_xyxy(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray,
                 eps: float = 1e-4) -> jnp.ndarray:
    """Pairwise IoU of axis-aligned (x1,y1,x2,y2) boxes: [..., n, 4] x [..., m, 4]
    -> [..., n, m].  Matches MV2D.box_iou (eps in the denominator)."""
    a = boxes_a[..., :, None, :]
    b = boxes_b[..., None, :, :]
    lt = jnp.maximum(a[..., 0:2], b[..., 0:2])
    rb = jnp.minimum(a[..., 2:4], b[..., 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + eps)


def bev_corners(boxes_bev: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, l, yaw) [..., 5] -> 4 corners [..., 4, 2], CCW order."""
    cx, cy, w, l, yaw = (boxes_bev[..., i] for i in range(5))
    # local corner offsets (CCW winding, required by the half-plane clipper)
    dx = 0.5 * jnp.stack([w, -w, -w, w], axis=-1)
    dy = 0.5 * jnp.stack([l, l, -l, -l], axis=-1)
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    x = cx[..., None] + c * dx - s * dy
    y = cy[..., None] + s * dx + c * dy
    return jnp.stack([x, y], axis=-1)


def _polygon_area(poly: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of a padded convex polygon.

    poly: [..., P, 2] vertices (first `count` valid, rest padded with copies of
    a valid vertex so they contribute zero); valid: [..., P] bool.
    """
    v = jnp.where(valid[..., None], poly, 0.0)
    # close the polygon over valid vertices only: use roll on masked index
    count = valid.sum(-1)
    idx = jnp.arange(poly.shape[-2])
    nxt = jnp.where(idx + 1 < count[..., None], idx + 1, 0)
    pnext = jnp.take_along_axis(v, nxt[..., None].astype(jnp.int32), axis=-2)
    cross = v[..., 0] * pnext[..., 1] - v[..., 1] * pnext[..., 0]
    cross = jnp.where(valid, cross, 0.0)
    return 0.5 * jnp.abs(cross.sum(-1))


def _clip_polygon_halfplane(poly: jnp.ndarray, count: jnp.ndarray,
                            p0: jnp.ndarray, p1: jnp.ndarray):
    """Sutherland-Hodgman: clip padded polygon by half-plane left of p0->p1.

    poly: [..., P, 2], count: [...] int, p0/p1: [..., 2].
    Returns new (poly, count) with the same padded size P (P must be large
    enough: intersection of two quads has <= 8 vertices).
    """
    P = poly.shape[-2]
    d = p1 - p0
    rel = poly - p0[..., None, :]
    side = d[..., None, 0] * rel[..., 1] - d[..., None, 1] * rel[..., 0]  # >0: inside
    idx = jnp.arange(P)
    valid = idx < count[..., None]
    inside = (side >= 0) & valid

    nxt = jnp.where(idx + 1 < count[..., None], idx + 1, 0).astype(jnp.int32)
    poly_n = jnp.take_along_axis(poly, nxt[..., None], axis=-2)
    side_n = jnp.take_along_axis(side, nxt, axis=-1)
    inside_n = jnp.take_along_axis(inside, nxt, axis=-1)

    denom = side - side_n
    t = side / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter_pt = poly + t[..., None] * (poly_n - poly)

    # each edge emits up to 2 vertices: current (if inside) and intersection
    # (if the edge crosses the boundary)
    emit_cur = inside
    emit_int = valid & (inside ^ inside_n)
    # output slots: 2 per edge, compacted with a stable sort over emit flags
    pts = jnp.stack([poly, inter_pt], axis=-2).reshape(*poly.shape[:-2], 2 * P, 2)
    emit = jnp.stack([emit_cur, emit_int], axis=-1).reshape(*poly.shape[:-2], 2 * P)
    order = jnp.argsort(~emit, axis=-1, stable=True)
    pts = jnp.take_along_axis(pts, order[..., None], axis=-2)
    emit = jnp.take_along_axis(emit, order, axis=-1)
    new_count = emit.sum(-1)
    return pts[..., :P, :], new_count


def iou_3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray,
           eps: float = 1e-8) -> jnp.ndarray:
    """Pairwise 3D IoU of bottom-center boxes (x, y, z, w, l, h, yaw).

    BEV polygon intersection x vertical overlap (replaces the mmdet3d
    iou3d calculators registered by the reference, core/bbox/
    iou_calculators/iou3d_calculator.py - unused by the MV2D loss path but
    part of the public surface).  boxes_a: [n, >=7], boxes_b: [m, >=7].
    """
    bev_a = jnp.stack([boxes_a[:, 0], boxes_a[:, 1], boxes_a[:, 3],
                       boxes_a[:, 4], boxes_a[:, 6]], axis=-1)
    bev_b = jnp.stack([boxes_b[:, 0], boxes_b[:, 1], boxes_b[:, 3],
                       boxes_b[:, 4], boxes_b[:, 6]], axis=-1)
    ca = bev_corners(bev_a)
    cb = bev_corners(bev_b)
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    P = 16
    poly = jnp.tile(ca[:, None], (1, m, 1, 1))
    poly = jnp.pad(poly, ((0, 0), (0, 0), (0, P - 4), (0, 0)))
    count = jnp.full((n, m), 4, dtype=jnp.int32)
    for e in range(4):
        p0 = jnp.broadcast_to(cb[None, :, e], (n, m, 2))
        p1 = jnp.broadcast_to(cb[None, :, (e + 1) % 4], (n, m, 2))
        poly, count = _clip_polygon_halfplane(poly, count, p0, p1)
    valid = jnp.arange(P) < count[..., None]
    inter_bev = _polygon_area(poly, valid)
    z1 = jnp.maximum(boxes_a[:, None, 2], boxes_b[None, :, 2])
    z2 = jnp.minimum(boxes_a[:, None, 2] + boxes_a[:, None, 5],
                     boxes_b[None, :, 2] + boxes_b[None, :, 5])
    inter_h = jnp.maximum(z2 - z1, 0.0)
    inter = inter_bev * inter_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.maximum(vol_a + vol_b - inter, eps)


def rotated_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray,
                    eps: float = 1e-8) -> jnp.ndarray:
    """Pairwise IoU of rotated BEV boxes (cx, cy, w, l, yaw).

    boxes_a: [n, 5], boxes_b: [m, 5] -> [n, m].  Exact convex polygon
    intersection (Sutherland-Hodgman with a fixed 16-vertex pad), replacing
    the mmdet3d rotated-IoU CUDA kernel.
    """
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    ca = bev_corners(boxes_a)                                # [n, 4, 2]
    cb = bev_corners(boxes_b)                                # [m, 4, 2]
    P = 16
    poly = jnp.tile(ca[:, None], (1, m, 1, 1))               # [n, m, 4, 2]
    poly = jnp.pad(poly, ((0, 0), (0, 0), (0, P - 4), (0, 0)))
    count = jnp.full((n, m), 4, dtype=jnp.int32)
    for e in range(4):
        p0 = jnp.broadcast_to(cb[None, :, e], (n, m, 2))
        p1 = jnp.broadcast_to(cb[None, :, (e + 1) % 4], (n, m, 2))
        poly, count = _clip_polygon_halfplane(poly, count, p0, p1)
    valid = jnp.arange(P) < count[..., None]
    inter = _polygon_area(poly, valid)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, eps)
