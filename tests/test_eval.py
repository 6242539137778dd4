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
