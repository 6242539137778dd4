import jax.numpy as jnp
import numpy as np

from mv2d_tpu.core import geometry as G


def make_cam(rng, n=2):
    """Random plausible camera rigs (nuScenes-like magnitudes)."""
    Ks, Es = [], []
    for _ in range(n):
        K = np.eye(4)
        K[0, 0] = rng.uniform(800, 1400)
        K[1, 1] = rng.uniform(800, 1400)
        K[0, 2] = rng.uniform(600, 900)
        K[1, 2] = rng.uniform(300, 500)
        # random rigid extrinsic
        a, b, c = rng.uniform(-np.pi, np.pi, 3)

        def rot(axis, t):
            cs, sn = np.cos(t), np.sin(t)
            m = np.eye(3)
            i, j = [(1, 2), (0, 2), (0, 1)][axis]
            m[i, i] = cs; m[i, j] = -sn; m[j, i] = sn; m[j, j] = cs
            return m
        R = rot(0, a) @ rot(1, b) @ rot(2, c)
        E = np.eye(4)
        E[:3, :3] = R
        E[:3, 3] = rng.uniform(-2, 2, 3)
        # the reference stores extrinsics such that lidar2img = K @ E^T
        Ks.append(K)
        Es.append(E.T)  # so E_stored^T = E
    return np.stack(Ks), np.stack(Es)


def test_prepare_camera_params_inverses(rng):
    K, E = make_cam(rng, 3)
    cam = G.prepare_camera_params(K, E)
    l2i = np.asarray(cam.lidar2img, dtype=np.float64)
    i2l = np.asarray(cam.img2lidar, dtype=np.float64)
    prod = l2i @ i2l
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (3, 1, 1)), atol=1e-3)
    tm = np.asarray(cam.trans_mats)
    # trans_mats[i, i] == identity
    for i in range(3):
        np.testing.assert_allclose(tm[i, i], np.eye(4), atol=1e-3)


def test_lid_depth_bins():
    bins = np.asarray(G.lid_depth_bins(0.5, 70.0, 8))
    assert bins[0] == 0.5
    # matches ref formula d_i = start + bin*i*(i+1)
    bs = (70.0 - 0.5) / (8 * 9)
    np.testing.assert_allclose(bins[3], 0.5 + bs * 3 * 4, rtol=1e-6)
    assert np.all(np.diff(bins) > 0)


def test_invert_projection_analytic(rng):
    K = np.zeros((5, 4, 4))
    # general projection form incl. image-plane rotation (post-ida aug)
    for i in range(5):
        t = rng.uniform(-0.3, 0.3)
        A = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
        A = A @ np.diag(rng.uniform(500, 1500, 2))
        K[i, :2, :2] = A
        K[i, :2, 2] = rng.uniform(-700, 700, 2)
        K[i, 2, 2] = 1
        K[i, 3, 3] = 1
    inv = np.asarray(G.invert_projection(jnp.asarray(K, dtype=jnp.float32)),
                     dtype=np.float64)
    np.testing.assert_allclose(inv @ K, np.tile(np.eye(4), (5, 1, 1)),
                               atol=1e-4)


def test_virtual_intrinsics_maps_box_to_roi(rng):
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 1000.0, 1000.0, 700.0, 400.0
    boxes = jnp.asarray([[100.0, 50.0, 240.0, 120.0]])
    Kv = G.virtual_intrinsics(boxes, jnp.asarray(K)[None], roi_size=(7, 7))
    Kv = np.asarray(Kv)[0]
    # a 3D point projecting to the box corner (x1, y1) in the original camera
    # must project to pixel -0.5 + 0.5*bin ... i.e. the roi-frame half-pixel
    # convention of the reference (mv2d_head.py:66: shift includes 0.5/scale).
    # Check: original-pixel x1 maps to roi coordinate -0.5/scale*scale = -0.5.
    scale_x = 7.0 / (240.0 - 100.0)
    u_orig = 100.0  # box left edge in original pixels
    # original projection: u = fx * X/Z + cx -> X/Z = (u - cx) / fx
    xz = (u_orig - K[0, 2]) / K[0, 0]
    u_roi = Kv[0, 0] * xz + Kv[0, 2]
    np.testing.assert_allclose(u_roi, -0.5 * scale_x * (1 / scale_x) * 1.0,
                               atol=1e-4)  # == -0.5... scaled: -0.5
    np.testing.assert_allclose(u_roi, -0.5, atol=1e-4)


def test_center2lidar_matches_full_inverse(rng):
    K, E = make_cam(rng, 2)
    cam = G.prepare_camera_params(K, E)
    boxes = jnp.asarray(rng.uniform(100, 400, (4, 2)).repeat(2, 0).reshape(4, 4))
    boxes = jnp.concatenate([boxes[:, :2], boxes[:, :2] + 80.0], axis=-1)
    view_of_roi = jnp.asarray([0, 0, 1, 1])
    Kv = G.virtual_intrinsics(boxes, cam.intrinsics[view_of_roi])
    uvd = jnp.asarray(
        np.stack([rng.uniform(0, 7, 4), rng.uniform(0, 7, 4),
                  rng.uniform(5, 50, 4)], -1), dtype=jnp.float32)
    out = np.asarray(G.center2lidar(uvd, Kv, cam.ext_t_inv[view_of_roi]))

    # reference computation: full f64 inverse of (K_virt @ E^T)
    Kv64 = np.asarray(Kv, dtype=np.float64)
    for r in range(4):
        v = int(view_of_roi[r])
        l2i = Kv64[r] @ E[v].T
        i2l = np.linalg.inv(l2i)
        u, vv, d = np.asarray(uvd[r], dtype=np.float64)
        p = np.array([u * d, vv * d, d, 1.0])
        ref = (i2l @ p)[:3]
        np.testing.assert_allclose(out[r], ref, rtol=1e-3, atol=1e-3)


def test_inverse_sigmoid():
    x = jnp.asarray([0.0, 0.5, 1.0, -0.2, 1.3])
    y = np.asarray(G.inverse_sigmoid(x))
    np.testing.assert_allclose(y[1], 0.0, atol=1e-6)
    assert y[0] < -10 and y[2] > 10
    assert np.isfinite(y).all()


def test_normalize_points_roundtrip(rng):
    pc_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
    pts = jnp.asarray(rng.uniform(-40, 40, (10, 3)), dtype=jnp.float32)
    n = G.normalize_points(pts, pc_range)
    rec = G.denormalize_points(n, pc_range)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts), atol=1e-4)


def test_points_img2cam_roundtrip(rng):
    # project camera points through K, then unproject back
    K = np.eye(4)
    K[0, 0], K[1, 1] = 1200.0, 1180.0
    K[0, 2], K[1, 2] = 700.0, 250.0
    xyz = rng.uniform(1.0, 40.0, (20, 3))
    uvd = (K[:3, :3] @ xyz.T).T
    uvd = np.concatenate([uvd[:, :2] / uvd[:, 2:3], uvd[:, 2:3]], axis=1)
    for shp in [(3, 3), (3, 4), (4, 4)]:
        out = G.points_img2cam(jnp.asarray(uvd, jnp.float32),
                               jnp.asarray(K[:shp[0], :shp[1]], jnp.float32))
        np.testing.assert_allclose(np.asarray(out), xyz, rtol=1e-3,
                                   atol=1e-2)
