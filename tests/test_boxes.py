import jax.numpy as jnp
import numpy as np

from mv2d_tpu.core import boxes as B


def test_normalize_denormalize_roundtrip(rng):
    raw = np.stack([
        rng.uniform(-50, 50, 32), rng.uniform(-50, 50, 32),
        rng.uniform(-4, 2, 32),
        rng.uniform(0.5, 5, 32), rng.uniform(0.5, 10, 32),
        rng.uniform(0.5, 4, 32),
        rng.uniform(-np.pi, np.pi, 32),
        rng.uniform(-10, 10, 32), rng.uniform(-10, 10, 32),
    ], axis=-1).astype(np.float32)
    code = B.normalize_bbox(jnp.asarray(raw))
    assert code.shape == (32, 10)
    rec = np.asarray(B.denormalize_bbox(code))
    np.testing.assert_allclose(rec, raw, rtol=1e-4, atol=1e-4)


def test_normalize_matches_reference_layout():
    # code layout is (cx, cy, logw, logl, cz, logh, sin, cos, vx, vy)
    # (ref: core/bbox/util.py:38-58)
    box = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 0.5, 7.0, 8.0]])
    code = np.asarray(B.normalize_bbox(box))[0]
    np.testing.assert_allclose(
        code,
        [1, 2, np.log(4), np.log(5), 3, np.log(6),
         np.sin(0.5), np.cos(0.5), 7, 8], rtol=1e-5)


def test_gravity_bottom_roundtrip():
    box = jnp.asarray([[0., 0., 1., 2., 2., 4., 0., 0., 0.]])
    bottom = B.gravity_to_bottom(box)
    assert bottom[0, 2] == -1.0
    np.testing.assert_allclose(np.asarray(B.bottom_to_gravity(bottom)),
                               np.asarray(box))


def test_box_iou_xyxy():
    a = jnp.asarray([[0., 0., 10., 10.]])
    b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 15.],
                     [20., 20., 30., 30.]])
    iou = np.asarray(B.box_iou_xyxy(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-3)


def test_rotated_iou_identity():
    boxes = jnp.asarray([[0., 0., 2., 4., 0.3], [5., 5., 1., 1., -0.7]])
    iou = np.asarray(B.rotated_iou_bev(boxes, boxes))
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-5)
    assert iou[0, 1] < 1e-6


def test_rotated_iou_axis_aligned_matches_aabb():
    # yaw=0 rotated IoU must equal axis-aligned IoU
    a = jnp.asarray([[0., 0., 10., 10., 0.]])
    b = jnp.asarray([[5., 0., 10., 10., 0.]])
    iou = float(B.rotated_iou_bev(a, b)[0, 0])
    np.testing.assert_allclose(iou, 50.0 / 150.0, atol=1e-5)


def test_rotated_iou_90deg():
    # a 2x4 box rotated by 90 deg vs its unrotated self: intersection 2x2
    a = jnp.asarray([[0., 0., 2., 4., 0.]])
    b = jnp.asarray([[0., 0., 2., 4., np.pi / 2]])
    iou = float(B.rotated_iou_bev(a, b)[0, 0])
    np.testing.assert_allclose(iou, 4.0 / 12.0, atol=1e-4)


def test_iou_3d_identity_and_disjoint():
    a = jnp.asarray([[0., 0., 0., 2., 4., 2., 0.3, 0., 0.]])
    b = jnp.asarray([[0., 0., 0., 2., 4., 2., 0.3, 0., 0.],
                     [0., 0., 5., 2., 4., 2., 0.3, 0., 0.],   # above: no z overlap
                     [20., 0., 0., 2., 4., 2., 0.3, 0., 0.]])
    iou = np.asarray(B.iou_3d(a, b))[0]
    np.testing.assert_allclose(iou[0], 1.0, atol=1e-5)
    assert iou[1] < 1e-6 and iou[2] < 1e-6


def test_iou_3d_half_height_overlap():
    a = jnp.asarray([[0., 0., 0., 2., 2., 2., 0., 0., 0.]])
    b = jnp.asarray([[0., 0., 1., 2., 2., 2., 0., 0., 0.]])
    iou = float(B.iou_3d(a, b)[0, 0])
    # intersection = 2*2*1 = 4, union = 8+8-4 = 12
    np.testing.assert_allclose(iou, 4 / 12, atol=1e-5)
