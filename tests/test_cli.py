"""End-to-end CLI smoke tests on the fake nuScenes fixture."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_data import _fake_nuscenes

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def _write_config(tmpdir, info_path, coco_path):
    cfg = f"""
data = dict(
    train=dict(info_path={info_path!r}, ann2d_path={coco_path!r},
               num_frames=1, final_dim=(64, 96), test_mode=False),
    val=dict(info_path={info_path!r}, ann2d_path={coco_path!r},
             num_frames=1, final_dim=(64, 96), test_mode=True),
)
model = dict(preset='tiny', overrides=dict(num_views=6))
optimizer = dict(lr=1e-4)
total_epochs = 1
log_interval = 1
"""
    path = os.path.join(tmpdir, 'cfg.py')
    with open(path, 'w') as f:
        f.write(cfg)
    return path


def _env():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    env['PYTHONPATH'] = REPO
    return env


@pytest.mark.slow
def test_train_and_test_cli(tmp_path):
    info_path, coco_path = _fake_nuscenes(str(tmp_path))
    cfg_path = _write_config(str(tmp_path), info_path, coco_path)
    work = str(tmp_path / 'work')
    # NOTE: tools/train.py flips jax to the env-selected platform itself?
    # -> it does not; rely on conftest-style env in the child process via
    # sitecustomize override: pass JAX_PLATFORMS and let train.py set it.
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'train.py'), cfg_path,
         '--work-dir', work, '--max-steps', '1'],
        env=_env(), capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'training done' in r.stdout
    assert os.path.exists(os.path.join(work, 'epoch_1'))

    # --auto-resume picks up the latest epoch_* checkpoint in work-dir
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'train.py'), cfg_path,
         '--work-dir', work, '--max-steps', '1', '--auto-resume'],
        env=_env(), capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'resumed from' in r.stdout
    assert 'epoch_1' in r.stdout

    # test.py restoring the TRAINING checkpoint (full TrainState ->
    # weights-only restore, the reference's load_checkpoint flow)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'test.py'), cfg_path,
         os.path.join(work, 'epoch_1'),
         '--max-samples', '2', '--out', str(tmp_path / 'res.json')],
        env=_env(), capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'mAP' in r.stdout
    sub = json.load(open(tmp_path / 'res.json'))
    assert 'results' in sub and len(sub['results']) == 2


def test_calibrate_buckets_cli(tmp_path):
    info_path, coco_path = _fake_nuscenes(str(tmp_path))
    cfg_path = _write_config(str(tmp_path), info_path, coco_path)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'calibrate_buckets.py'),
         cfg_path, '--samples', '4'],
        env=_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'model.overrides.k_max=' in r.stdout
    assert 'model.overrides.max_gt=' in r.stdout
    assert 'key-pixel union' in r.stdout


def test_update_data_coords_cli(tmp_path):
    import pickle
    old = {'infos': [{'gt_boxes': np.array([[1., 2., 0., 2.0, 4.0, 1.5,
                                             0.3]]),
                      'timestamp': 0}],
           'metadata': {}}
    src = str(tmp_path / 'old.pkl')
    dst = str(tmp_path / 'new.pkl')
    with open(src, 'wb') as f:
        pickle.dump(old, f)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'misc.py'),
         'update_data_coords', src, dst],
        env=_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(dst, 'rb') as f:
        out = pickle.load(f)
    gt = out['infos'][0]['gt_boxes'][0]
    # dims swapped w,l -> l,w; yaw = -old - pi/2
    np.testing.assert_allclose(gt[3:6], [4.0, 2.0, 1.5])
    np.testing.assert_allclose(gt[6], -0.3 - np.pi / 2)
    assert out['metadata']['coord_version'] == '1.0'
    # idempotent: migrating the migrated file is a no-op
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'misc.py'),
         'update_data_coords', dst, str(tmp_path / 'new2.pkl')],
        env=_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and 'already' in r.stdout


def test_fuse_conv_bn_cli(tmp_path):
    import orbax.checkpoint as ocp
    ckpt = {
        'params': {'backbone': {
            'layer1_0': {
                'conv1': {'kernel': np.full((1, 1, 2, 2), 2.0, np.float32)},
                'bn1': {'scale': np.array([2.0, 1.0], np.float32),
                        'bias': np.array([0.5, 0.0], np.float32)},
            },
        }},
        'constants': {'backbone': {
            'layer1_0': {
                'bn1': {'mean': np.array([1.0, 0.0], np.float32),
                        'var': np.array([4.0, 1.0], np.float32)},
            },
        }},
    }
    src = str(tmp_path / 'src')
    ocp.StandardCheckpointer().save(src, ckpt)
    dst = str(tmp_path / 'dst')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'misc.py'),
         'fuse_conv_bn', src, dst],
        env=_env(), capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = ocp.StandardCheckpointer().restore(os.path.abspath(dst))
    blk = out['params']['backbone']['layer1_0']
    cblk = out['constants']['backbone']['layer1_0']
    s = 2.0 / np.sqrt(4.0 + 1e-5)
    np.testing.assert_allclose(blk['conv1']['kernel'][..., 0], 2.0 * s,
                               rtol=1e-6)
    np.testing.assert_allclose(blk['bn1']['bias'], [0.5 - 1.0 * s, 0.0],
                               rtol=1e-6)
    np.testing.assert_allclose(blk['bn1']['scale'], [1.0, 1.0])
    np.testing.assert_allclose(cblk['bn1']['mean'], [0.0, 0.0])
    np.testing.assert_allclose(cblk['bn1']['var'], [1.0, 1.0])
