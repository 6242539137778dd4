import json
import os

import numpy as np
import pytest

from mv2d_tpu.data import converter as cv


def _quat_z(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _fake_tables(tmpdir, n_samples=2):
    """Minimal raw nuScenes v1.0 table set: 1 scene, 6 cams + lidar."""
    tdir = os.path.join(tmpdir, 'v1.0-mini')
    os.makedirs(tdir, exist_ok=True)
    samples, sample_data, calib, ego, anns = [], [], [], [], []
    sensors = [dict(token='s_lidar', channel='LIDAR_TOP', modality='lidar')]
    for c in cv.CAM_SENSORS:
        sensors.append(dict(token=f's_{c}', channel=c, modality='camera'))
    instances = [dict(token='inst0', category_token='cat0')]
    categories = [dict(token='cat0', name='vehicle.car')]
    attributes = [dict(token='attr0', name='vehicle.moving')]
    scenes = [dict(token='scene0', name='scene-0001')]

    prev_sd = {c: '' for c in cv.CAM_SENSORS}
    for s in range(n_samples):
        ts = int(1e6 * (10 + 0.5 * s))
        stok = f'sample{s}'
        samples.append(dict(token=stok, timestamp=ts, scene_token='scene0',
                            prev=f'sample{s-1}' if s else '', next=''))
        ego.append(dict(token=f'ego{s}', timestamp=ts,
                        translation=[100.0 + 5 * s, 50.0, 0.0],
                        rotation=_quat_z(0.1)))
        calib.append(dict(token=f'cs_lidar{s}', sensor_token='s_lidar',
                          translation=[0.9, 0.0, 1.8],
                          rotation=_quat_z(0.0), camera_intrinsic=[]))
        sample_data.append(dict(
            token=f'sd_lidar{s}', sample_token=stok,
            calibrated_sensor_token=f'cs_lidar{s}', ego_pose_token=f'ego{s}',
            filename=f'lidar{s}.bin', is_key_frame=True, timestamp=ts,
            prev='', next=''))
        for ci, c in enumerate(cv.CAM_SENSORS):
            ang = 2 * np.pi * ci / 6
            calib.append(dict(
                token=f'cs_{c}{s}', sensor_token=f's_{c}',
                translation=[1.5 * np.cos(ang), 1.5 * np.sin(ang), 1.5],
                rotation=[0.5, -0.5, 0.5, -0.5],
                camera_intrinsic=[[1200.0, 0, 800], [0, 1200.0, 450],
                                  [0, 0, 1]]))
            tok = f'sd_{c}{s}'
            sample_data.append(dict(
                token=tok, sample_token=stok,
                calibrated_sensor_token=f'cs_{c}{s}',
                ego_pose_token=f'ego{s}', filename=f'{c}_{s}.jpg',
                is_key_frame=True, timestamp=ts + 1000,
                prev=prev_sd[c], next=''))
            prev_sd[c] = tok
        anns.append(dict(
            token=f'ann{s}', sample_token=stok, instance_token='inst0',
            translation=[110.0 + 5 * s, 52.0, 1.0], size=[2.0, 4.5, 1.6],
            rotation=_quat_z(0.4), num_lidar_pts=12, num_radar_pts=3,
            attribute_tokens=['attr0'], prev=f'ann{s-1}' if s else '',
            next=f'ann{s+1}' if s < n_samples - 1 else ''))

    for name, rows in [('sample', samples), ('sample_data', sample_data),
                       ('calibrated_sensor', calib), ('ego_pose', ego),
                       ('sample_annotation', anns), ('sensor', sensors),
                       ('instance', instances), ('category', categories),
                       ('attribute', attributes), ('scene', scenes)]:
        with open(os.path.join(tdir, f'{name}.json'), 'w') as f:
            json.dump(rows, f)
    return tmpdir


def test_create_infos_and_2d_export(tmp_path):
    root = _fake_tables(str(tmp_path))
    infos = cv.create_infos(root, 'v1.0-mini', max_sweeps=2)
    assert len(infos) == 2
    info = infos[0]
    assert set(info['cams']) == set(cv.CAM_SENSORS)
    assert info['gt_boxes'].shape == (1, 7)
    assert info['gt_names'][0] == 'car'
    assert info['valid_flag'][0]
    # gt box must be in the lidar frame: global (110, 52, 1) w/ ego at
    # (100, 50, 0) yaw 0.1, lidar at (0.9, 0, 1.8)
    b = info['gt_boxes'][0]
    ca, sa = np.cos(-0.1), np.sin(-0.1)
    expect_xy_ego = np.asarray([ca * 10 - sa * 2, sa * 10 + ca * 2])
    np.testing.assert_allclose(b[:2], expect_xy_ego - [0.9, 0], atol=1e-6)
    # bottom z = (1.0 - 0.0 ego - 1.8 lidar) - h/2
    np.testing.assert_allclose(b[2], 1.0 - 1.8 - 0.8, atol=1e-6)
    # velocity: 5m per 0.5s along global x -> ~10 m/s
    v = info['gt_velocity'][0]
    np.testing.assert_allclose(np.linalg.norm(v), 10.0, atol=0.1)
    # second sample has one historical sweep frame
    assert len(infos[1]['sweeps']) == 1
    sweep_cam = infos[1]['sweeps'][0]['CAM_FRONT']
    assert 'lidar2img' in sweep_cam and sweep_cam['lidar2img'].shape == (4, 4)

    coco = cv.export_2d_annotations(infos)
    assert len(coco['images']) == 12
    assert len(coco['annotations']) >= 1
    ann = coco['annotations'][0]
    assert ann['bbox'][2] > 0 and ann['bbox'][3] > 0
    assert len(ann['bbox_cam3d']) == 3
    # projected center consistency: bbox_cam3d z > 0 for visible box
    assert ann['bbox_cam3d'][2] > 0
