"""Numpy oracle for the epipolar correlation (independent re-derivation of
the reference algorithm's math: 4x4 in-box sample grid, 8 LID depths,
cross-view projection, membership + hull-IoU top-k)."""
import jax.numpy as jnp
import numpy as np

from mv2d_tpu.core.geometry import prepare_camera_params
from mv2d_tpu.models.correlation import CorrelationConfig, epipolar_in_box
from tests.test_model import make_rig


def oracle_epipolar(boxes, valid, trans_mats, pad_shape, cfg):
    """Direct numpy transcription of the matching math."""
    V, P = boxes.shape[:2]
    R = V * P
    H, W = pad_shape
    depths = []
    bs = (cfg.depth_end - cfg.depth_start) / (cfg.num_depth *
                                              (1 + cfg.num_depth))
    for i in range(cfg.num_depth):
        depths.append(cfg.depth_start + bs * i * (i + 1))
    t = np.linspace(0, 1, cfg.sample_size)
    gy, gx = np.meshgrid(t, t, indexing='ij')
    grid = np.stack([gx, gy], -1).reshape(-1, 2)

    ids = np.full((R, 1 + V * cfg.topk), -1, np.int64)
    mask = np.zeros((R, 1 + V * cfg.topk), bool)
    for v in range(V):
        for p in range(P):
            r = v * P + p
            ids[r, 0] = r
            mask[r, 0] = valid[v, p]
            if not valid[v, p]:
                continue
            b = boxes[v, p]
            pts = b[:2] + (b[2:] - b[:2]) * grid          # [S, 2]
            for tv in range(V):
                col0 = 1 + tv * cfg.topk
                # project all sample points x depths into view tv
                uvs, oks = [], []
                for (u, w_) in pts:
                    for d in depths:
                        hom = np.array([u * d, w_ * d, d, 1.0])
                        q = trans_mats[v, tv] @ hom
                        z = q[2]
                        uv = q[:2] / max(z, 1e-2)
                        ok = (z >= cfg.depth_start and tv != v and
                              0 <= uv[0] <= W - 1 and 0 <= uv[1] <= H - 1)
                        uvs.append(uv)
                        oks.append(ok)
                uvs = np.asarray(uvs)
                oks = np.asarray(oks)
                # membership in target boxes
                in_view = False
                for tp in range(P):
                    if not valid[tv, tp]:
                        continue
                    tb = boxes[tv, tp]
                    inb = (uvs[:, 0] >= tb[0]) & (uvs[:, 0] <= tb[2]) & \
                          (uvs[:, 1] >= tb[1]) & (uvs[:, 1] <= tb[3]) & oks
                    if inb.any():
                        in_view = True
                if not in_view:
                    continue
                # hull of valid projected points
                if oks.any():
                    hull = np.array([uvs[oks, 0].min(), uvs[oks, 1].min(),
                                     uvs[oks, 0].max(), uvs[oks, 1].max()])
                else:
                    hull = np.array([1e4, 1e4, -1e4, -1e4])
                ious = np.zeros(P)
                for tp in range(P):
                    if not valid[tv, tp]:
                        continue
                    tb = boxes[tv, tp]
                    x1 = max(hull[0], tb[0]); y1 = max(hull[1], tb[1])
                    x2 = min(hull[2], tb[2]); y2 = min(hull[3], tb[3])
                    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                    a = (hull[2] - hull[0]) * (hull[3] - hull[1])
                    bb = (tb[2] - tb[0]) * (tb[3] - tb[1])
                    ious[tp] = inter / (a + bb - inter + 1e-4)
                order = np.argsort(-ious)[:cfg.topk]
                top = ious[order]
                mx = top.max() if len(top) else 0
                for c, (tp, i_) in enumerate(zip(order, top)):
                    ids[r, col0 + c] = tv * P + tp
                    mask[r, col0 + c] = bool(
                        ((i_ > cfg.ratio * mx) or (i_ > cfg.iou_thr))
                        and i_ > 0)
    return ids, mask


def test_correlation_matches_numpy_oracle(rng):
    K, E = make_rig(3, fx=80.0, size=(64, 96))
    cam = prepare_camera_params(K, E)
    V, P = 3, 4
    boxes = np.zeros((V, P, 4), np.float32)
    valid = np.zeros((V, P), bool)
    for v in range(V):
        n = rng.integers(1, P + 1)
        xy = rng.uniform(0, 60, (n, 2))
        wh = rng.uniform(8, 30, (n, 2))
        boxes[v, :n] = np.concatenate([xy, xy + wh], 1)
        valid[v, :n] = True
    cfg = CorrelationConfig(sample_size=4, num_depth=8, topk=3)
    ids, mask = epipolar_in_box(jnp.asarray(boxes), jnp.asarray(valid),
                                cam.trans_mats, (64, 96), cfg)
    ids, mask = np.asarray(ids), np.asarray(mask)
    oid, omask = oracle_epipolar(boxes, valid,
                                 np.asarray(cam.trans_mats, np.float64),
                                 (64, 96), cfg)
    # compare the SET of correlated rois per query (order within topk may
    # differ on ties)
    for r in range(V * P):
        got = set(ids[r][mask[r]].tolist())
        want = set(oid[r][omask[r]].tolist())
        assert got == want, (r, got, want)


def test_all_matched_matches_numpy_oracle(rng):
    """'all_matched' (ref box_correlation.py:305-335): every box with
    positive hull-IoU in an epipolar-matched view correlates.  Oracle: the
    topk path with topk=P and no threshold selects by iou>0 - identical
    correlated SETS."""
    K, E = make_rig(3, fx=80.0, size=(64, 96))
    cam = prepare_camera_params(K, E)
    V, P = 3, 4
    boxes = np.zeros((V, P, 4), np.float32)
    valid = np.zeros((V, P), bool)
    for v in range(V):
        n = rng.integers(1, P + 1)
        xy = rng.uniform(0, 60, (n, 2))
        wh = rng.uniform(8, 30, (n, 2))
        boxes[v, :n] = np.concatenate([xy, xy + wh], 1)
        valid[v, :n] = True
    cfg = CorrelationConfig.from_mode_string('all_matched', sample_size=4,
                                             num_depth=8)
    assert cfg.mode == 'all_matched'
    ids, mask = epipolar_in_box(jnp.asarray(boxes), jnp.asarray(valid),
                                cam.trans_mats, (64, 96), cfg)
    ids, mask = np.asarray(ids), np.asarray(mask)
    assert ids.shape == (V * P, 1 + V * P)
    ocfg = CorrelationConfig(sample_size=4, num_depth=8, topk=P,
                             iou_thr=0.0, ratio=0.0)
    oid, omask = oracle_epipolar(boxes, valid,
                                 np.asarray(cam.trans_mats, np.float64),
                                 (64, 96), ocfg)
    for r in range(V * P):
        got = set(ids[r][mask[r]].tolist())
        want = set(oid[r][omask[r]].tolist())
        assert got == want, (r, got, want)


def test_gathered_cross_equals_full_mask(rng):
    """The key-column-first cross computation (models/mv2d.py pixel branch)
    == gathering columns of the full query_pixel_masks matmul."""
    import jax.numpy as jnp
    from mv2d_tpu.models.correlation import (query_pixel_masks,
                                             gather_active_keys)
    V, P, h, w = 3, 6, 4, 5
    R, hw = V * P, h * w
    A = jnp.asarray(rng.uniform(size=(R, R)) < 0.2)
    A = A | jnp.eye(R, dtype=bool)
    in_roi = jnp.asarray(rng.uniform(size=(V, P, hw)) < 0.3)
    M = query_pixel_masks(A, in_roi)
    union_ref = M.any(axis=0)
    qact = A.any(axis=0).reshape(V, P)
    union = (in_roi & qact[:, :, None]).any(axis=1).reshape(-1)
    np.testing.assert_array_equal(np.asarray(union), np.asarray(union_ref))
    k_max = 16
    key_idx, key_active = gather_active_keys(union, k_max)
    vk = key_idx // hw
    ik = key_idx % hw
    G = in_roi[:, :, ik] & (jnp.arange(V)[:, None, None] == vk[None, None])
    hits = jnp.einsum('rvp,vpk->rk', A.reshape(R, V, P).astype(jnp.float32),
                      G.astype(jnp.float32))
    cross = (hits > 0.5) & key_active[None]
    cross_ref = M[:, key_idx] & key_active[None]
    np.testing.assert_array_equal(np.asarray(cross), np.asarray(cross_ref))
