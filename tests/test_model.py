import jax
import jax.numpy as jnp
import numpy as np

from mv2d_tpu import configs
from mv2d_tpu.core.geometry import prepare_camera_params
from mv2d_tpu.models.correlation import (CorrelationConfig,
                                         adjacency_from_correlation,
                                         epipolar_in_box, gather_active_keys,
                                         in_roi_pixel_masks,
                                         query_pixel_masks)
from mv2d_tpu.models.detector2d import Proposals
from mv2d_tpu.models.mv2d import MV2D, GroundTruth3D

KEY = jax.random.PRNGKey(0)


def make_rig(n=2, fx=60.0, size=(64, 96)):
    """Forward-facing cameras slightly offset along y (stereo-ish)."""
    Ks, Es = [], []
    for i in range(n):
        K = np.eye(4)
        K[0, 0] = K[1, 1] = fx
        K[0, 2], K[1, 2] = size[1] / 2, size[0] / 2
        # camera at y offset, looking along +x (lidar frame):
        # cam coords: x_cam = -y_lidar, y_cam = -z_lidar, z_cam = x_lidar
        R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float64)
        t = np.array([0.0, i * 0.6, 0.0])
        E = np.eye(4)
        E[:3, :3] = R
        E[:3, 3] = -R @ t
        Ks.append(K)
        Es.append(E.T)      # stored so that lidar2img = K @ E_stored^T
    return np.stack(Ks), np.stack(Es)


def test_correlation_finds_cross_view_match():
    K, E = make_rig(2)
    cam = prepare_camera_params(K, E)
    # one object 10m ahead, visible in both cameras near image center
    uv0, d0 = _project(cam, 0, np.array([10.0, 0.0, 0.0]))
    uv1, d1 = _project(cam, 1, np.array([10.0, 0.0, 0.0]))
    boxes = np.zeros((2, 3, 4), np.float32)
    valid = np.zeros((2, 3), bool)
    boxes[0, 0] = [uv0[0] - 6, uv0[1] - 6, uv0[0] + 6, uv0[1] + 6]
    boxes[1, 0] = [uv1[0] - 6, uv1[1] - 6, uv1[0] + 6, uv1[1] + 6]
    # a decoy far corner box in view 1
    boxes[1, 1] = [0, 0, 8, 8]
    valid[0, 0] = valid[1, 0] = valid[1, 1] = True
    cfg = CorrelationConfig(sample_size=2, num_depth=8, topk=2)
    ids, mask = epipolar_in_box(jnp.asarray(boxes), jnp.asarray(valid),
                                cam.trans_mats, (64, 96), cfg)
    ids, mask = np.asarray(ids), np.asarray(mask)
    # roi 0 (view 0) must correlate with roi 3 (view 1 slot 0)
    matched = set(ids[0][mask[0]].tolist())
    assert 0 in matched and 3 in matched
    # invalid rois have no correlation at all
    assert not mask[1].any() and not mask[2].any()


def _project(cam, view, pt):
    l2i = np.asarray(cam.lidar2img, dtype=np.float64)[view]
    q = l2i @ np.array([*pt, 1.0])
    return q[:2] / q[2], q[2]


def test_pixel_masks_and_gather():
    boxes = np.zeros((2, 2, 4), np.float32)
    valid = np.zeros((2, 2), bool)
    boxes[0, 0] = [0, 0, 32, 32]       # view 0
    boxes[1, 0] = [64, 32, 96, 64]     # view 1
    valid[0, 0] = valid[1, 0] = True
    in_roi = in_roi_pixel_masks(jnp.asarray(boxes), jnp.asarray(valid),
                                (4, 6), 16.0, 0.0)
    assert in_roi.shape == (2, 2, 24)
    ids = jnp.asarray([[0, 2], [1, 0], [2, 0], [3, 0]])
    mask = jnp.asarray([[True, True], [False, False],
                        [True, False], [False, False]])
    A = adjacency_from_correlation(ids, mask, 4)
    A = np.asarray(A)
    assert A[0, 0] and A[0, 2] and A[2, 2] and not A[1].any()
    M = query_pixel_masks(jnp.asarray(A), in_roi)
    M = np.asarray(M)
    # query 0 correlates with roi 0 (view0 box) and roi 2 (view1 box)
    assert M[0, :24].sum() > 0 and M[0, 24:].sum() > 0
    union = jnp.asarray(M.any(0))
    idx, active = gather_active_keys(union, 16)
    assert np.asarray(active).sum() == np.asarray(union).sum() \
        or np.asarray(active).all()


def test_mv2d_inference_end_to_end(rng):
    cfg = configs.tiny(key_mode='pixel')
    V = cfg.total_views
    K, E = make_rig(V)
    cam = prepare_camera_params(K, E)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)),
                       dtype=jnp.float32)
    img_shapes = jnp.asarray([[*cfg.image_size]] * V)
    model = MV2D(cfg)
    params = model.init(KEY, imgs, cam, img_shapes)
    fwd = jax.jit(lambda p, i: model.apply(p, i, cam, img_shapes))
    boxes, scores, labels, valid = fwd(params, imgs)
    assert boxes.shape == (cfg.max_per_scene, 9)
    assert np.isfinite(np.asarray(boxes)).all()
    assert np.isfinite(np.asarray(scores)).all()


def test_mv2d_roi_mode_inference(rng):
    cfg = configs.tiny(key_mode='roi')
    V = cfg.total_views
    K, E = make_rig(V)
    cam = prepare_camera_params(K, E)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)),
                       dtype=jnp.float32)
    img_shapes = jnp.asarray([[*cfg.image_size]] * V)
    model = MV2D(cfg)
    params = model.init(KEY, imgs, cam, img_shapes)
    boxes, scores, labels, valid = model.apply(params, imgs, cam, img_shapes)
    assert np.isfinite(np.asarray(boxes)).all()


def test_mv2d_train_head_with_dn(rng):
    cfg = configs.tiny(key_mode='pixel', num_frames=2)
    V = cfg.total_views
    K, E = make_rig(V)
    cam = prepare_camera_params(K, E, timestamps=[0.0] * 2 + [0.5] * 2)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)),
                       dtype=jnp.float32)
    img_shapes = jnp.asarray([[*cfg.image_size]] * V)
    P = cfg.proposal_train.max_per_img
    pb = np.zeros((V, P, 4), np.float32)
    pv = np.zeros((V, P), bool)
    pb[:, 0] = [30, 20, 60, 50]
    pv[:, 0] = True
    proposals = Proposals(boxes=jnp.asarray(pb),
                          scores=jnp.zeros((V, P)),
                          labels=jnp.zeros((V, P), jnp.int32),
                          valid=jnp.asarray(pv))
    G = cfg.max_gt
    gtb = np.zeros((G, 9), np.float32)
    gtb[:2] = [[10, 0, -1, 2, 4, 1.5, 0.3, 1, 0],
               [12, 2, -1, 2, 4, 1.5, -0.2, 0, 0]]
    gt = GroundTruth3D(boxes=jnp.asarray(gtb),
                       labels=jnp.zeros((G,), jnp.int32),
                       valid=jnp.asarray(np.arange(G) < 2))
    model = MV2D(cfg)
    variables = model.init(
        {'params': KEY, 'dropout': jax.random.PRNGKey(1)},
        imgs, cam, img_shapes, proposals, gt, jax.random.PRNGKey(2),
        method=MV2D.forward_train_head)
    out = model.apply(variables, imgs, cam, img_shapes, proposals, gt,
                      jax.random.PRNGKey(2), method=MV2D.forward_train_head,
                      rngs={'dropout': jax.random.PRNGKey(3)})
    L, R = cfg.num_decoder_layers, V * P
    assert out.all_cls_scores.shape == (L, R, cfg.num_classes)
    assert out.dn_cls_scores.shape == (L, cfg.dn_pad, cfg.num_classes)
    assert np.isfinite(np.asarray(out.all_bbox_preds)).all()
    assert np.isfinite(np.asarray(out.dn_bbox_preds)).all()
    assert int(np.asarray(out.dn_info.num_gt)) == 2
    # overflow accounting invariant (the tiny preset's k_max is
    # deliberately tight, so overflow may be nonzero here)
    active = int(np.asarray(out.diagnostics['key_active']))
    overflow = int(np.asarray(out.diagnostics['key_overflow']))
    assert active > 0
    assert overflow == max(0, active - cfg.k_max)
    assert int(np.asarray(out.diagnostics['num_queries'])) == int(pv.sum())


def test_mv2d_single_stage_detector_inference(rng):
    """Single-stage detector family (ref SingleStageDetBase): the RetinaNet
    head's detections feed the 3D head through the same Proposals
    interface."""
    cfg = configs.tiny(key_mode='pixel', detector_type='single_stage')
    V = cfg.total_views
    K, E = make_rig(V)
    cam = prepare_camera_params(K, E)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)),
                       dtype=jnp.float32)
    img_shapes = jnp.asarray([[*cfg.image_size]] * V)
    model = MV2D(cfg)
    params = model.init(KEY, imgs, cam, img_shapes)
    boxes, scores, labels, valid = model.apply(params, imgs, cam, img_shapes)
    assert boxes.shape == (cfg.max_per_scene, 9)
    assert np.isfinite(np.asarray(boxes)).all()


def test_single_stage_loss_targets(rng):
    """Anchor-head loss: a perfectly-matching anchor yields near-zero bbox
    loss and the focal loss decreases when logits favor the right class."""
    from mv2d_tpu.train import detector2d_loss as d2l
    anchors = jnp.asarray([[10., 10., 50., 50.], [60., 60., 80., 80.],
                           [0., 0., 4., 4.]])
    gt = jnp.asarray([[10., 10., 50., 50.]])
    gtl = jnp.asarray([2])
    gtv = jnp.asarray([True])
    K = 5
    deltas = jnp.zeros((3, 4))
    good = jnp.full((3, K), -4.0).at[0, 2].set(4.0)
    bad = jnp.full((3, K), -4.0).at[0, 2].set(-4.0).at[0, 1].set(4.0)
    lg = d2l.single_stage_loss(good, deltas, anchors, gt, gtl, gtv, K)
    lb = d2l.single_stage_loss(bad, deltas, anchors, gt, gtl, gtv, K)
    assert float(lg['loss_bbox']) < 1e-6          # exact anchor, zero deltas
    assert float(lg['loss_cls']) < float(lb['loss_cls'])
    assert int(lg['num_pos']) == 1


def test_s2d_prefolded_input_matches(rng):
    """Pre-folded [V, H/2, W/2, 12] input (host s2d) must produce the
    SAME detections as [V, H, W, 3] - the stem consumes the folded
    layout directly (nn/resnet.py) and grid_mask dispatches on shape."""
    from mv2d_tpu.data.padding import s2d_fold_images
    cfg = configs.tiny(key_mode='pixel')
    V = cfg.total_views
    K, E = make_rig(V)
    cam = prepare_camera_params(K, E)
    imgs = np.asarray(rng.normal(size=(V, *cfg.image_size, 3)), np.float32)
    img_shapes = jnp.asarray([[*cfg.image_size]] * V)
    model = MV2D(cfg)
    params = model.init(KEY, jnp.asarray(imgs), cam, img_shapes)
    fwd = jax.jit(lambda p, i: model.apply(p, i, cam, img_shapes))
    ref = fwd(params, jnp.asarray(imgs))
    got = fwd(params, jnp.asarray(s2d_fold_images(imgs)))
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_grid_mask_s2d_equivalence(rng):
    from mv2d_tpu.data.padding import s2d_fold_images
    from mv2d_tpu.ops.grid_mask import grid_mask
    imgs = np.asarray(rng.normal(size=(4, 32, 48, 3)), np.float32)
    key = jax.random.PRNGKey(7)
    ref = np.asarray(grid_mask(key, jnp.asarray(imgs)))
    got = np.asarray(grid_mask(key, jnp.asarray(s2d_fold_images(imgs))))
    np.testing.assert_array_equal(s2d_fold_images(ref), got)
