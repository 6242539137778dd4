"""Protocol-exactness tests for mv2d_tpu.eval.nuscenes_eval.

Oracle: an independent, literal transcription of the nuscenes-devkit
evaluation (nuscenes/eval/detection/algo.py + evaluate.py +
common/loaders.filter_eval_boxes + common/utils), written object-per-box
with plain Python loops exactly as the devkit does it.  The framework
evaluator (vectorized, sample-dict based) must reproduce it to 1e-9 on
randomized fixtures including range filtering, attributes, ties, empty
classes, and classes with no matches.
"""
import numpy as np
import pytest

from mv2d_tpu.eval import nuscenes_eval as ne

# ------------------------------------------------------------------ oracle

TP_METRICS = ['trans_err', 'scale_err', 'orient_err', 'vel_err', 'attr_err']


class Box:
    def __init__(self, sample_token, translation, size, yaw, velocity,
                 name, score=-1.0, attr='', ego_dist=0.0):
        self.sample_token = sample_token
        self.translation = translation    # gravity center (x, y, z)
        self.size = size                  # (w, l, h)
        self.yaw = yaw
        self.velocity = velocity
        self.detection_name = name
        self.detection_score = score
        self.attribute_name = attr
        self.ego_dist = ego_dist


def center_distance(gt, pred):
    return np.linalg.norm(np.array(pred.translation[:2]) -
                          np.array(gt.translation[:2]))


def velocity_l2(gt, pred):
    return np.linalg.norm(np.array(pred.velocity) - np.array(gt.velocity))


def yaw_diff_o(gt, pred, period):
    d = (gt.yaw - pred.yaw) % period
    if d > period / 2:
        d = period - d
    return abs(d)


def scale_iou_o(gt, pred):
    mins = np.minimum(gt.size, pred.size)
    inter = float(np.prod(mins))
    union = float(np.prod(gt.size)) + float(np.prod(pred.size)) - inter
    return inter / union


def attr_acc_o(gt, pred):
    if gt.attribute_name == '':
        return np.nan
    return float(gt.attribute_name == pred.attribute_name)


def cummean_o(x):
    if sum(np.isnan(x)) == len(x):
        return np.ones(len(x))
    sum_vals = np.nancumsum(x.astype(float))
    count_vals = np.cumsum(~np.isnan(x))
    return np.divide(sum_vals, count_vals, out=np.zeros_like(sum_vals),
                     where=count_vals != 0)


def no_predictions_md():
    md = dict(recall=np.linspace(0, 1, 101), precision=np.zeros(101),
              confidence=np.zeros(101))
    for m in TP_METRICS:
        md[m] = np.ones(101)
    return md


def accumulate_o(gt_all, pred_all, class_name, dist_th):
    """Literal port of devkit algo.accumulate.  gt_all/pred_all: dicts
    sample_token -> list[Box]."""
    npos = len([1 for boxes in gt_all.values() for b in boxes
                if b.detection_name == class_name])
    if npos == 0:
        return no_predictions_md()
    pred_boxes_list = [b for boxes in pred_all.values() for b in boxes
                       if b.detection_name == class_name]
    pred_confs = [b.detection_score for b in pred_boxes_list]
    sortind = [i for (v, i) in sorted((v, i) for (v, i)
                                      in zip(pred_confs,
                                             range(len(pred_confs))))][::-1]
    tp, fp, conf = [], [], []
    match_data = {m: [] for m in TP_METRICS}
    match_data['conf'] = []
    taken = set()
    for ind in sortind:
        pred_box = pred_boxes_list[ind]
        min_dist = np.inf
        match_gt_idx = None
        for gt_idx, gt_box in enumerate(gt_all[pred_box.sample_token]):
            if (gt_box.detection_name == class_name and
                    (pred_box.sample_token, gt_idx) not in taken):
                this_distance = center_distance(gt_box, pred_box)
                if this_distance < min_dist:
                    min_dist = this_distance
                    match_gt_idx = gt_idx
        is_match = min_dist < dist_th
        if is_match:
            taken.add((pred_box.sample_token, match_gt_idx))
            tp.append(1)
            fp.append(0)
            conf.append(pred_box.detection_score)
            gtm = gt_all[pred_box.sample_token][match_gt_idx]
            match_data['trans_err'].append(center_distance(gtm, pred_box))
            match_data['vel_err'].append(velocity_l2(gtm, pred_box))
            match_data['scale_err'].append(1 - scale_iou_o(gtm, pred_box))
            period = np.pi if class_name == 'barrier' else 2 * np.pi
            match_data['orient_err'].append(
                yaw_diff_o(gtm, pred_box, period))
            match_data['attr_err'].append(1 - attr_acc_o(gtm, pred_box))
            match_data['conf'].append(pred_box.detection_score)
        else:
            tp.append(0)
            fp.append(1)
            conf.append(pred_box.detection_score)
    if len(match_data['trans_err']) == 0:
        return no_predictions_md()
    tp = np.cumsum(tp).astype(float)
    fp = np.cumsum(fp).astype(float)
    conf = np.array(conf)
    prec = tp / (fp + tp)
    rec = tp / float(npos)
    rec_interp = np.linspace(0, 1, 101)
    prec = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, conf, right=0)
    md = dict(recall=rec_interp, precision=prec, confidence=conf_i)
    for key in TP_METRICS:
        tmp = cummean_o(np.array(match_data[key]))
        md[key] = np.interp(conf_i[::-1],
                            np.array(match_data['conf'])[::-1],
                            tmp[::-1])[::-1]
    return md


def calc_ap_o(md, min_recall=0.1, min_precision=0.1):
    prec = np.copy(md['precision'])
    prec = prec[round(100 * min_recall) + 1:]
    prec -= min_precision
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - min_precision)


def calc_tp_o(md, metric, min_recall=0.1):
    first_ind = round(100 * min_recall) + 1
    non_zero = np.nonzero(md['confidence'])[0]
    last_ind = int(non_zero[-1]) if len(non_zero) else 0
    if last_ind < first_ind:
        return 1.0
    return float(np.mean(md[metric][first_ind:last_ind + 1]))


def filter_boxes_o(box_dict, ranges):
    out = {}
    for tok, boxes in box_dict.items():
        out[tok] = [b for b in boxes
                    if b.ego_dist < ranges[b.detection_name]]
    return out


def evaluate_o(gt_all, pred_all, classes, filter_range=True):
    """Literal port of devkit evaluate.py main metric assembly."""
    if filter_range:
        gt_all = filter_boxes_o(gt_all, ne.CLASS_RANGES)
        pred_all = filter_boxes_o(pred_all, ne.CLASS_RANGES)
    mean_dist_aps = {}
    label_tp = {m: [] for m in TP_METRICS}
    for cls in classes:
        aps = []
        for th in ne.DIST_THS:
            md = accumulate_o(gt_all, pred_all, cls, th)
            aps.append(calc_ap_o(md))
            if th == ne.TP_DIST_TH:
                md_tp = md
        mean_dist_aps[cls] = float(np.mean(aps))
        for m in TP_METRICS:
            if cls in ('traffic_cone',) and m in ('attr_err', 'vel_err',
                                                  'orient_err'):
                label_tp[m].append(np.nan)
            elif cls in ('barrier',) and m in ('attr_err', 'vel_err'):
                label_tp[m].append(np.nan)
            else:
                label_tp[m].append(calc_tp_o(md_tp, m))
    mAP = float(np.mean(list(mean_dist_aps.values())))
    out = dict(mAP=mAP)
    nds = [5 * mAP]
    for m in TP_METRICS:
        with np.errstate(invalid='ignore'):
            mtp = float(np.nanmean(label_tp[m]))
        if np.isnan(mtp):
            mtp = 1.0
        out['m' + m] = mtp
        nds.append(max(0.0, 1.0 - mtp))
    out['NDS'] = float(sum(nds) / 10.0)
    for cls, ap in mean_dist_aps.items():
        out[cls + '_AP'] = ap
    return out


# --------------------------------------------------------------- fixtures

CLS_POOL = ('car', 'pedestrian', 'barrier', 'traffic_cone', 'bus')
ATTRS = {'car': ('vehicle.moving', 'vehicle.parked', ''),
         'bus': ('vehicle.moving', ''),
         'pedestrian': ('pedestrian.moving', 'pedestrian.standing'),
         'barrier': ('',), 'traffic_cone': ('',)}


def make_fixture(rng, n_samples=4, max_gt=8, max_pred=12, score_ties=False):
    """Random scenes -> (framework-format lists, oracle-format dicts)."""
    preds_f, gts_f = [], []
    preds_o, gts_o = {}, {}
    for si in range(n_samples):
        tok = f's{si}'
        ng = rng.integers(0, max_gt + 1)
        gb = np.zeros((ng, 9))
        gb[:, :2] = rng.uniform(-55, 55, (ng, 2))
        gb[:, 2] = rng.uniform(-2, 0, ng)
        gb[:, 3:6] = rng.uniform(0.5, 4, (ng, 3))
        gb[:, 6] = rng.uniform(-np.pi, np.pi, ng)
        gb[:, 7:9] = rng.uniform(-3, 3, (ng, 2))
        gn = rng.choice(CLS_POOL, ng)
        ga = np.asarray([rng.choice(ATTRS[n]) for n in gn], dtype=object)
        gts_f.append(dict(boxes=gb, names=gn, attrs=ga))
        gts_o[tok] = [
            Box(tok, (gb[i, 0], gb[i, 1], gb[i, 2] + gb[i, 5] / 2),
                tuple(gb[i, 3:6]), gb[i, 6], tuple(gb[i, 7:9]), str(gn[i]),
                attr=str(ga[i]),
                ego_dist=float(np.linalg.norm(gb[i, :2])))
            for i in range(ng)]

        npr = rng.integers(0, max_pred + 1)
        # predictions: mix of perturbed GT and random boxes
        pb = np.zeros((npr, 9))
        pn = []
        for i in range(npr):
            if ng and rng.random() < 0.6:
                j = rng.integers(0, ng)
                pb[i] = gb[j] + np.r_[rng.normal(0, 1.2, 2),
                                      rng.normal(0, 0.3),
                                      rng.normal(0, 0.4, 3),
                                      rng.normal(0, 0.5),
                                      rng.normal(0, 0.8, 2)]
                pb[i, 3:6] = np.abs(pb[i, 3:6]) + 0.1
                pn.append(str(gn[j]) if rng.random() < 0.8
                          else str(rng.choice(CLS_POOL)))
            else:
                pb[i, :2] = rng.uniform(-55, 55, 2)
                pb[i, 3:6] = rng.uniform(0.5, 4, 3)
                pb[i, 6] = rng.uniform(-np.pi, np.pi)
                pb[i, 7:9] = rng.uniform(-3, 3, 2)
                pn.append(str(rng.choice(CLS_POOL)))
        pn = np.asarray(pn) if npr else np.zeros(0, dtype='<U16')
        if score_ties:
            ps = rng.choice([0.3, 0.6, 0.9], npr)
        else:
            ps = rng.uniform(0, 1, npr)
        pa = np.asarray([rng.choice(ATTRS[n]) for n in pn], dtype=object) \
            if npr else np.zeros(0, dtype=object)
        preds_f.append(dict(boxes=pb, names=pn, scores=ps, attrs=pa))
        preds_o[tok] = [
            Box(tok, (pb[i, 0], pb[i, 1], pb[i, 2] + pb[i, 5] / 2),
                tuple(pb[i, 3:6]), pb[i, 6], tuple(pb[i, 7:9]), str(pn[i]),
                score=float(ps[i]), attr=str(pa[i]),
                ego_dist=float(np.linalg.norm(pb[i, :2])))
            for i in range(npr)]
    return preds_f, gts_f, preds_o, gts_o


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
@pytest.mark.parametrize('ties', [False, True])
def test_evaluate_matches_devkit_port(seed, ties):
    rng = np.random.default_rng(seed)
    preds_f, gts_f, preds_o, gts_o = make_fixture(rng, score_ties=ties)
    got = ne.evaluate(preds_f, gts_f, classes=CLS_POOL)
    want = evaluate_o(gts_o, preds_o, CLS_POOL)
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, atol=1e-9, err_msg=k)


def test_accumulate_curves_match_port():
    rng = np.random.default_rng(7)
    preds_f, gts_f, preds_o, gts_o = make_fixture(rng, n_samples=6)
    pf = [ne.filter_sample_by_range(p) for p in preds_f]
    gf = [ne.filter_sample_by_range(g) for g in gts_f]
    po = filter_boxes_o(preds_o, ne.CLASS_RANGES)
    go = filter_boxes_o(gts_o, ne.CLASS_RANGES)
    for cls in CLS_POOL:
        for th in ne.DIST_THS:
            md = ne.accumulate(pf, gf, cls, th)
            mo = accumulate_o(go, po, cls, th)
            for k in ('precision', 'confidence', *TP_METRICS):
                np.testing.assert_allclose(md[k], mo[k], atol=1e-12,
                                           err_msg=f'{cls}@{th}:{k}')


def test_range_filter_uses_ego_frame():
    # box 49.5 m from lidar origin, lidar is ~1 m behind ego origin ->
    # ego distance 50.5 m: must be filtered for car (range 50), kept if
    # no l2e given
    box = np.zeros((1, 9))
    box[0, :2] = (49.5, 0.0)
    box[0, 3:6] = 1.0
    s = dict(boxes=box, names=np.asarray(['car']),
             l2e_r=np.eye(3), l2e_t=np.asarray([1.0, 0, 0]))
    out = ne.filter_sample_by_range(s)
    assert len(out['names']) == 0
    s2 = dict(boxes=box, names=np.asarray(['car']))
    assert len(ne.filter_sample_by_range(s2)['names']) == 1


def test_class_with_no_gt_contributes_zero_ap_and_unit_tp():
    # devkit: a class absent from GT drags mAP down and mTP up
    gt = dict(boxes=np.zeros((0, 9)), names=np.zeros(0, dtype='<U8'))
    car = np.zeros((1, 9))
    car[0, 3:6] = 1
    gt2 = dict(boxes=car, names=np.asarray(['car']))
    pred = dict(boxes=car.copy(), names=np.asarray(['car']),
                scores=np.asarray([0.9]))
    m = ne.evaluate([pred], [gt2], classes=('car', 'bus'))
    assert m['bus_AP'] == 0.0
    assert m['bus_trans_err'] == 1.0
    np.testing.assert_allclose(m['mAP'], m['car_AP'] / 2)


def test_tp_error_global_score_ordering():
    # two samples; the high-score match (sample B) has small trans err,
    # the low-score match (sample A) has large err.  Curve order must be
    # by GLOBAL score, not per-sample append order.
    g1 = dict(boxes=np.asarray([[0., 0, 0, 1, 1, 1, 0, 0, 0]]),
              names=np.asarray(['car']))
    g2 = dict(boxes=np.asarray([[0., 0, 0, 1, 1, 1, 0, 0, 0]]),
              names=np.asarray(['car']))
    p1 = dict(boxes=np.asarray([[1.5, 0, 0, 1, 1, 1, 0, 0, 0]]),
              names=np.asarray(['car']), scores=np.asarray([0.2]))
    p2 = dict(boxes=np.asarray([[0.1, 0, 0, 1, 1, 1, 0, 0, 0]]),
              names=np.asarray(['car']), scores=np.asarray([0.9]))
    md = ne.accumulate([p1, p2], [g1, g2], 'car', 2.0)
    # cummean in global score order: [0.1, (0.1+1.5)/2 = 0.8]
    # recall grid: npos=2 -> recall 0.5 at conf 0.9, recall 1.0 at 0.2
    assert abs(md['trans_err'][50] - 0.1) < 1e-9
    assert abs(md['trans_err'][100] - 0.8) < 1e-9
    m = ne.evaluate([p1, p2], [g1, g2], classes=('car',))
    # calc_tp: mean over indices 11..100 of the interpolated cummean curve
    want = np.mean(np.interp(np.linspace(0, 1, 101),
                             [0.5, 1.0], [0.1, 0.8])[11:101])
    np.testing.assert_allclose(m['car_trans_err'], want, atol=1e-9)
