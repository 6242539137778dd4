import json
import os
import pickle

import numpy as np
import pytest

from mv2d_tpu.data import nuscenes as nusc
from mv2d_tpu.data import pipeline as pl


def test_ida_matrix_maps_points(rng):
    p = pl.IdaParams(resize=0.5, resize_dims=(800, 450), crop=(10, 20, 710, 420),
                     flip=False, rotate=0.0)
    m = pl.ida_matrix(p)
    src = np.asarray([100.0, 200.0, 1.0])
    dst = m @ src
    np.testing.assert_allclose(dst[:2], [100 * 0.5 - 10, 200 * 0.5 - 20])


def test_ida_flip_matrix():
    p = pl.IdaParams(resize=1.0, resize_dims=(100, 100), crop=(0, 0, 100, 80),
                     flip=True, rotate=0.0)
    m = pl.ida_matrix(p)
    dst = m @ np.asarray([30.0, 10.0, 1.0])
    np.testing.assert_allclose(dst[:2], [70, 10])


def test_apply_ida_image_shapes(rng):
    img = rng.uniform(0, 255, (90, 160, 3)).astype(np.float32)
    p = pl.sample_ida(np.random.default_rng(0),
                      pl.IdaAugConfig(final_dim=(64, 96), H=90, W=160,
                                      resize_lim=(0.8, 1.0)), training=True)
    out = pl.apply_ida_image(img, p)
    assert out.shape == (64, 96, 3)


def test_transform_boxes_2d_resize_crop():
    p = pl.IdaParams(resize=0.5, resize_dims=(800, 450), crop=(0, 0, 400, 225),
                     flip=False, rotate=0.0)
    boxes = np.asarray([[100, 100, 300, 300]], np.float32)
    out, keep = pl.transform_boxes_2d(boxes, p)
    np.testing.assert_allclose(out[0], [50, 50, 150, 150])
    assert keep[0]


def test_global_rot_scale_projection_invariant(rng):
    """Transformed GT centers must project to the same pixels through the
    transformed lidar2img - the aug's defining property."""
    from tests.test_model import make_rig
    K, E = make_rig(2)
    l2i = K @ np.transpose(E, (0, 2, 1))
    gt = np.zeros((3, 9), np.float32)
    gt[:, :3] = rng.uniform(5, 20, (3, 3)) * [1, 0.2, 0.05]
    gt[:, 3:6] = 2.0
    pix_before = []
    for v in range(2):
        q = l2i[v] @ np.concatenate([gt[0, :3], [1]])
        pix_before.append(q[:2] / q[2])
    l2i2, E2, gt2 = pl.global_rot_scale(np.random.default_rng(3), l2i.copy(),
                                        E.copy(), gt)
    for v in range(2):
        q = l2i2[v] @ np.concatenate([gt2[0, :3], [1]])
        np.testing.assert_allclose(q[:2] / q[2], pix_before[v], atol=1e-3)
    # consistency: lidar2img == K @ E'^T after the aug
    np.testing.assert_allclose(l2i2, K @ np.transpose(E2, (0, 2, 1)),
                               atol=1e-6)


def test_native_preprocess_matches_numpy(rng):
    img = rng.uniform(0, 255, (90, 160, 3)).astype(np.uint8)
    p = pl.IdaParams(resize=0.5, resize_dims=(80, 45), crop=(2, 0, 66, 40),
                     flip=True, rotate=0.0)
    out = pl.native_preprocess([img, img], p)
    if out is None:
        pytest.skip('native lib not built')
    ref = pl.normalize_image(pl.apply_ida_image(img.astype(np.float32), p))
    assert out.shape == (2, 40, 64, 3)
    # interpolation conventions match cv2 to within rounding noise
    assert np.abs(out[0] - ref).mean() < 0.05


def _fake_nuscenes(tmpdir, n_samples=2, n_gt=1):
    import cv2
    rng = np.random.default_rng(0)
    infos = []
    img_dir = os.path.join(tmpdir, 'imgs')
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    img_id, ann_id = 0, 0
    for s in range(n_samples):
        cams = {}
        for ci, cam in enumerate(nusc.CAM_SENSORS):
            fn = os.path.join(img_dir, f's{s}_{cam}.jpg')
            cv2.imwrite(fn, rng.integers(0, 255, (90, 160, 3)).astype(np.uint8))
            R = np.eye(3)
            cams[cam] = dict(
                data_path=fn, timestamp=(s * 0.5 + ci * 0.01) * 1e6,
                sensor2lidar_rotation=R,
                sensor2lidar_translation=np.zeros(3),
                cam_intrinsic=np.asarray([[100., 0, 80], [0, 100., 45],
                                          [0, 0, 1]]))
            images.append(dict(id=img_id, file_name=os.path.basename(fn)))
            # one 2D box per view matching gt0's camera center
            anns.append(dict(id=ann_id, image_id=img_id,
                             bbox=[40, 20, 40, 30], category_id=0,
                             iscrowd=0, bbox_cam3d=[5.0, 0.0, -1.25 + 0.75]))
            img_id += 1
            ann_id += 1
        gt = np.asarray([[5.0 + 2.0 * g, 0.0, -1.25, 2.0, 4.0, 1.5, 0.3]
                         for g in range(n_gt)])
        infos.append(dict(
            token=f'tok{s}', lidar_path='', sweeps=[],
            timestamp=s * 0.5 * 1e6, cams=cams,
            gt_boxes=gt,
            gt_names=np.asarray(['car'] * n_gt),
            gt_velocity=np.asarray([[1.0, 0.0]] * n_gt),
            valid_flag=np.asarray([True] * n_gt),
            num_lidar_pts=np.asarray([10] * n_gt)))
    info_path = os.path.join(tmpdir, 'infos.pkl')
    with open(info_path, 'wb') as f:
        pickle.dump(dict(infos=infos), f)
    coco_path = os.path.join(tmpdir, 'coco.json')
    with open(coco_path, 'w') as f:
        json.dump(dict(images=images, annotations=anns,
                       categories=[dict(id=i, name=c)
                                   for i, c in enumerate(nusc.CLASSES)]), f)
    return info_path, coco_path


def test_dataset_end_to_end(tmp_path, rng):
    info_path, coco_path = _fake_nuscenes(str(tmp_path))
    ds = nusc.NuScenesDataset(
        info_path=info_path, ann2d_path=coco_path, num_frames=1,
        final_dim=(64, 96),
        ida=pl.IdaAugConfig(final_dim=(64, 96), H=90, W=160),
        test_mode=False)
    s = ds.get_sample(0, np.random.default_rng(0))
    assert s['imgs'].shape == (6, 64, 96, 3)
    assert s['gt3d_valid'].sum() == 1
    assert s['gt3d_boxes'][0, 3] > 0
    assert s['intrinsics'].shape == (6, 4, 4)
    # train batch conversion (host s2d fold by default)
    batch = nusc.to_train_batch(s)
    assert batch.imgs.shape == (6, 32, 48, 12)
    batch3 = nusc.to_train_batch(s, s2d=False)
    assert batch3.imgs.shape == (6, 64, 96, 3)
    from mv2d_tpu.data.padding import s2d_fold_images
    np.testing.assert_array_equal(
        np.asarray(batch.imgs), s2d_fold_images(np.asarray(batch3.imgs)))
    assert batch.gt2d.boxes.shape[0] == 6


def test_dataset_two_frames(tmp_path, rng):
    info_path, coco_path = _fake_nuscenes(str(tmp_path))
    ds = nusc.NuScenesDataset(
        info_path=info_path, ann2d_path=coco_path, num_frames=2,
        final_dim=(64, 96),
        ida=pl.IdaAugConfig(final_dim=(64, 96), H=90, W=160),
        test_mode=True)
    s = ds.get_sample(0, np.random.default_rng(0))
    # empty sweeps -> current frame repeated (pad_empty_sweeps);
    # test_mode samples arrive PRE-FOLDED from the C++ s2d path
    assert s['imgs'].shape == (12, 32, 48, 12)
    # the fold is exactly s2d_fold_images of the [V, H, W, 3] layout
    from mv2d_tpu.data.padding import s2d_unfold_images
    unf = s2d_unfold_images(np.asarray(s['imgs']))
    assert unf.shape == (12, 64, 96, 3)
    imgs_j, _, _ = nusc.to_eval_inputs(s)
    assert imgs_j.shape == (12, 32, 48, 12)
    assert (s['timestamps'][6:] > s['timestamps'][:6]).all()


def test_load_separate_roundtrip(tmp_path):
    """load_separate spills per-sample pkls and resolves them lazily
    (ref custom_nuscenes_dataset.py:48-57); samples must match the
    in-memory path exactly."""
    info_path, coco_path = _fake_nuscenes(str(tmp_path))
    kw = dict(info_path=info_path, ann2d_path=coco_path, num_frames=1,
              final_dim=(64, 96),
              ida=pl.IdaAugConfig(final_dim=(64, 96), H=90, W=160),
              test_mode=True)
    ds_sep = nusc.NuScenesDataset(load_separate=True, **kw)
    ds_mem = nusc.NuScenesDataset(**kw)
    assert len(ds_sep) == len(ds_mem)
    assert isinstance(ds_sep.infos[0], str) and \
        os.path.exists(ds_sep.infos[0])
    # get_info resolves paths -> dicts (eval runner / visualize use it)
    for i in range(len(ds_sep)):
        gi = ds_sep.get_info(i)
        assert gi['token'] == ds_mem.get_info(i)['token']
    s1 = ds_sep.get_sample(0, np.random.default_rng(3))
    s2 = ds_mem.get_sample(0, np.random.default_rng(3))
    np.testing.assert_array_equal(s1['imgs'], s2['imgs'])
    np.testing.assert_array_equal(s1['lidar2img'], s2['lidar2img'])
    assert s1['token'] == s2['token']


def test_calibration_scan_uncensored(tmp_path):
    """The bucket scan must see RAW annotation counts, not counts clipped
    by the dataset's current (possibly too-small) buckets."""
    from mv2d_tpu import configs
    from mv2d_tpu.data import calibration as cal
    info_path, coco_path = _fake_nuscenes(str(tmp_path), n_gt=5)
    ds = nusc.NuScenesDataset(
        info_path=info_path, ann2d_path=coco_path, num_frames=1,
        final_dim=(64, 96),
        ida=pl.IdaAugConfig(final_dim=(64, 96), H=90, W=160),
        test_mode=False,
        buckets=nusc.SampleBuckets(max_gt3d=2, max_gt2d=1))
    mcfg = configs.tiny(num_views=6)
    stats = cal.scan_dataset(ds, mcfg, samples=2)
    # 5 raw GT > the 2-wide bucket: a censored scan would report 2
    assert max(stats['gt3d_counts']) == 5
    # and the dataset's own buckets are restored afterwards
    assert ds.buckets.max_gt3d == 2 and ds.buckets.max_gt2d == 1


def test_ms_resize_crop_flip_appends_center_zooms(rng):
    """MSResizeCropFlipImage parity: N+view_num outputs; appended views are
    center_size-x zooms whose intrinsics map the same world ray to the
    zoomed pixel (ida homography applied to K)."""
    from mv2d_tpu.data.pipeline import (IdaAugConfig, IdaParams,
                                        ida_matrix, ms_center_crop_params,
                                        ms_resize_crop_flip)
    cfg = IdaAugConfig(final_dim=(128, 352), H=225, W=400,
                       resize_lim=(0.88, 0.88), rand_flip=False)
    imgs = [rng.uniform(0, 255, (225, 400, 3)).astype(np.float32)
            for _ in range(3)]
    Ks = []
    for _ in range(3):
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 300.0
        K[0, 2], K[1, 2] = 200.0, 112.0
        Ks.append(K)
    Es = [np.eye(4) for _ in range(3)]
    ts = [0.0, 0.0, 0.0]
    p = IdaParams(0.88, (int(400 * .88), int(225 * .88)), (0, 30, 352, 158),
                  False, 0.0)
    out_i, out_k, out_e, out_t = ms_resize_crop_flip(
        imgs, Ks, Es, ts, p, cfg, view_num=2, center_size=2.0)
    assert len(out_i) == 5 and len(out_k) == 5 and len(out_t) == 5
    assert out_i[3].shape == (128, 352, 3)
    cp = ms_center_crop_params(p.resize, cfg, 2.0)
    want = ida_matrix(cp) @ Ks[0][:3, :3]
    np.testing.assert_allclose(out_k[3][:3, :3], want, rtol=1e-6)
    # zoomed view focal length is center_size x the base-aug view's
    assert out_k[3][0, 0] / out_k[0][0, 0] == pytest.approx(2.0, rel=1e-6)


def test_calibration_module(tmp_path):
    """Bucket auto-sizing: scan/recommend/apply (data/calibration.py)."""
    from mv2d_tpu import configs
    from mv2d_tpu.data import calibration as cal
    from mv2d_tpu.data import pipeline as pl

    info_path, coco_path = _fake_nuscenes(str(tmp_path))
    ds = nusc.NuScenesDataset(
        info_path=info_path, ann2d_path=coco_path, num_frames=1,
        final_dim=(64, 96),
        ida=pl.IdaAugConfig(final_dim=(64, 96), H=90, W=160),
        test_mode=False)
    mcfg = configs.tiny(num_views=6)
    rec, stats = cal.calibrate(ds, mcfg, samples=4)
    assert stats['n'] == min(4, len(ds))
    assert max(stats['gt3d_counts']) >= 1
    # recommendation floors/quantization
    assert rec['max_gt'] >= 8 and rec['max_gt'] % 8 == 0
    assert rec['k_max'] >= 1024 and rec['k_max'] % 1024 == 0
    h, w = stats['feat_hw']
    assert rec['k_max'] <= cal.round_up(mcfg.total_views * h * w, 1024)

    # apply raises small buckets, never shrinks explicit larger ones
    cfg = {'model': {'preset': 'tiny', 'overrides': {}}}
    applied = cal.apply_to_config(cfg, rec, mcfg)
    assert applied == {'max_gt': rec['max_gt'], 'k_max': rec['k_max']}
    assert cfg['model']['overrides']['k_max'] == rec['k_max']
    cfg2 = {'model': {'overrides': {'k_max': 10 ** 6,
                                    'max_gt': 10 ** 4}}}
    assert cal.apply_to_config(cfg2, rec, mcfg) == {}
    assert cfg2['model']['overrides']['k_max'] == 10 ** 6


def test_calibration_pixel_union():
    from mv2d_tpu.data import calibration as cal
    boxes = np.array([[0., 0., 31., 31.], [64., 0., 95., 15.],
                      [0., 0., 95., 63.]])
    valid = np.array([True, True, False])
    # stride 16, no expand: boxes cover [0:3,0:3] and [0:2,4:6] -> 9 + 4
    assert cal.pixel_union(boxes, valid, (4, 6), 16, 0) == 13
    # expand 1: clipped to [0:4,0:4] and [0:3,3:6], overlapping 3 cells
    assert cal.pixel_union(boxes, valid, (4, 6), 16, 1) == 16 + 9 - 3
