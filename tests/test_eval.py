import numpy as np

from mv2d_tpu.eval import nuscenes_eval as ne
from mv2d_tpu.utils import config as cfgmod


def _sample(rng, n=5, cls='car'):
    boxes = np.zeros((n, 9))
    boxes[:, :2] = rng.uniform(-30, 30, (n, 2))
    boxes[:, 2] = -1.5
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:, 7:9] = rng.uniform(-2, 2, (n, 2))
    return dict(boxes=boxes, names=np.asarray([cls] * n),
                attrs=np.asarray(['vehicle.moving'] * n, dtype=object))


def test_perfect_predictions_map1(rng):
    gts = [_sample(rng) for _ in range(3)]
    preds = []
    for g in gts:
        p = dict(boxes=g['boxes'].copy(), names=g['names'].copy(),
                 scores=rng.uniform(0.5, 1.0, len(g['boxes'])),
                 attrs=g['attrs'].copy())
        preds.append(p)
    m = ne.evaluate(preds, gts, classes=('car',))
    assert m['car_AP'] > 0.99
    assert m['mAP'] > 0.99
    assert m['mtrans_err'] < 1e-6
    assert m['NDS'] > 0.99


def test_no_predictions(rng):
    gts = [_sample(rng)]
    preds = [dict(boxes=np.zeros((0, 9)), names=np.asarray([]),
                  scores=np.zeros(0))]
    m = ne.evaluate(preds, gts, classes=('car',))
    assert m['mAP'] == 0.0
    assert m['NDS'] <= 0.5


def test_half_detected(rng):
    g = _sample(rng, n=10)
    # detect 5 of 10 perfectly, 5 false positives far away at lower score
    pb = np.concatenate([g['boxes'][:5],
                         g['boxes'][5:] + np.asarray([200, 200, 0, 0, 0, 0,
                                                      0, 0, 0])])
    p = dict(boxes=pb, names=np.asarray(['car'] * 10),
             scores=np.r_[np.full(5, 0.9), np.full(5, 0.1)])
    m = ne.evaluate([p], [g], classes=('car',))
    assert 0.3 < m['car_AP'] < 0.55


def test_translation_error_measured(rng):
    g = _sample(rng, n=4)
    pb = g['boxes'].copy()
    pb[:, 0] += 0.5   # half-meter offset
    p = dict(boxes=pb, names=g['names'].copy(), scores=np.full(4, 0.9))
    m = ne.evaluate([p], [g], classes=('car',))
    np.testing.assert_allclose(m['car_trans_err'], 0.5, atol=1e-6)
    # 0.5m offset drops AP at the 0.5 threshold only
    assert 0.7 < m['car_AP'] <= 0.80


def test_submission_json_devkit_schema(rng, tmp_path):
    """Submission JSON validates against the official devkit schema
    (nuscenes-devkit eval/detection/data_classes.py DetectionBox /
    EvalBox asserts + loaders.load_prediction), so an official-devkit
    run won't fail on format: exact meta keys, per-box field names,
    lengths, finite values, DETECTION_NAMES / ATTRIBUTE_NAMES
    membership, <=500 boxes/sample, and global-frame translation."""
    import json

    from mv2d_tpu.eval import results as res

    # devkit constants (nuscenes/eval/detection/constants.py)
    DETECTION_NAMES = {
        'car', 'truck', 'bus', 'trailer', 'construction_vehicle',
        'pedestrian', 'motorcycle', 'bicycle', 'traffic_cone', 'barrier'}
    ATTRIBUTE_NAMES = {
        '', 'cycle.with_rider', 'cycle.without_rider', 'pedestrian.moving',
        'pedestrian.standing', 'pedestrian.sitting_lying_down',
        'vehicle.moving', 'vehicle.parked', 'vehicle.stopped'}

    n = 12
    boxes = np.zeros((n, 9))
    boxes[:, :2] = rng.uniform(-30, 30, (n, 2))
    boxes[:, 2] = -1.5
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes[:, 7:9] = rng.uniform(-3, 3, (n, 2))
    labels = rng.integers(0, 10, n)
    scores = rng.uniform(0, 1, n)
    valid = np.ones(n, bool)
    valid[-2:] = False

    yaw_e = 0.3
    info = dict(
        lidar2ego_rotation=[np.cos(0.05), 0, 0, np.sin(0.05)],
        lidar2ego_translation=[0.94, 0.0, 1.84],
        ego2global_rotation=[np.cos(yaw_e / 2), 0, 0, np.sin(yaw_e / 2)],
        ego2global_translation=[600.0, 1600.0, 0.0])
    token = 'fa1bc5fe5dd9405cbd83c8e6b27f5a2e'
    pred = res.boxes_to_pred_dict(boxes, scores, labels, valid, info)
    sub = res.to_nuscenes_submission([token], [pred], {token: info})

    # round-trip through json like tools/test.py --format-only does
    path = tmp_path / 'results_nusc.json'
    res.save_submission(str(path), sub)
    sub = json.loads(path.read_text())

    assert set(sub.keys()) == {'meta', 'results'}
    assert set(sub['meta'].keys()) == {
        'use_camera', 'use_lidar', 'use_radar', 'use_map', 'use_external'}
    assert all(isinstance(v, bool) for v in sub['meta'].values())
    assert sub['meta']['use_camera'] and not sub['meta']['use_lidar']

    assert set(sub['results'].keys()) == {token}
    recs = sub['results'][token]
    assert 0 < len(recs) <= 500          # loaders.load_prediction cap
    want_fields = {'sample_token', 'translation', 'size', 'rotation',
                   'velocity', 'detection_name', 'detection_score',
                   'attribute_name'}
    l2e_r = res.quat_to_rot(info['lidar2ego_rotation'])
    e2g_r = res.quat_to_rot(info['ego2global_rotation'])
    for rec in recs:
        assert want_fields <= set(rec.keys())
        assert rec['sample_token'] == token
        for key, ln in (('translation', 3), ('size', 3), ('rotation', 4),
                        ('velocity', 2)):
            v = np.asarray(rec[key], np.float64)
            assert v.shape == (ln,) and np.isfinite(v).all(), key
        assert (np.asarray(rec['size']) > 0).all()
        # EvalBox: rotation is a unit quaternion [w, x, y, z]
        np.testing.assert_allclose(np.linalg.norm(rec['rotation']), 1.0,
                                    atol=1e-9)
        assert rec['detection_name'] in DETECTION_NAMES
        assert rec['attribute_name'] in ATTRIBUTE_NAMES
        assert isinstance(rec['detection_score'], float)
        assert 0.0 <= rec['detection_score'] <= 1.0

    # translation is GLOBAL frame: invert the chain on record 0 and
    # recover the lidar-frame gravity center of the first valid box
    b0 = boxes[0]
    rec0 = recs[0]
    back = l2e_r.T @ (e2g_r.T @ (np.asarray(rec0['translation'])
                                 - np.asarray(
                                     info['ego2global_translation']))
                      - np.asarray(info['lidar2ego_translation']))
    np.testing.assert_allclose(back, b0[:3] + [0, 0, b0[5] / 2], atol=1e-9)
    # velocity is global-frame too (rotated, not translated)
    v0 = l2e_r.T @ e2g_r.T @ np.r_[np.asarray(rec0['velocity']), 0.0]
    np.testing.assert_allclose(v0[:2], b0[7:9], atol=1e-9)
    # invalid rows are dropped
    assert len(recs) == int(valid.sum())


def test_config_system(tmp_path):
    base = tmp_path / 'base.py'
    base.write_text("model = dict(depth=50, neck=dict(out=256))\nlr = 1e-4\n")
    child = tmp_path / 'child.py'
    child.write_text(
        "_base_ = ['base.py']\n"
        "model = dict(neck=dict(out=128))\n"
        "opt = dict(_delete_=True, type='AdamW')\n")
    cfg = cfgmod.load_config(str(child))
    assert cfg['model']['depth'] == 50
    assert cfg['model']['neck']['out'] == 128
    assert cfg['lr'] == 1e-4
    assert cfg['opt'] == {'type': 'AdamW'}
    cfg2 = cfgmod.apply_overrides(cfg, ['model.depth=101', 'lr=0.5'])
    assert cfg2['model']['depth'] == 101 and cfg2['lr'] == 0.5
    # config-style dict(...) values (mmcv DictAction accepts these; a
    # silently-kept string crashed an eval hook mid-soak, round 5)
    cfg3 = cfgmod.apply_overrides(
        cfg, ['evaluation=dict(interval=10, max_samples=4)'])
    assert cfg3['evaluation'] == {'interval': 10, 'max_samples': 4}
