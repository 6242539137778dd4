"""Standalone nuScenes detection-metric evaluator (mAP / TP errors / NDS).

The reference delegates evaluation to the nuscenes-devkit
(ref: custom_nuscenes_dataset.py:370-428 -> NuScenesEval).  The devkit is not
a dependency of this framework, so the official protocol is re-implemented
here (numpy only), following the published nuScenes detection metric:

  * per (class, dist_threshold in {0.5, 1, 2, 4} m) AP: predictions matched
    greedily by descending score to unmatched GT within BEV center distance;
    AP = normalized area of the 101-point precision-recall curve above
    recall 0.1 / precision 0.1,
  * TP errors at the 2 m threshold over the recall>0.1 region:
    ATE (m, BEV center), ASE (1 - IoU after alignment), AOE (rad, period 2pi;
    pi for barriers), AVE (m/s, BEV), AAE (1 - attribute accuracy; skipped
    for classes without attributes and when attributes are unavailable),
  * NDS = (5*mAP + sum_tp max(0, 1 - mTP)) / 10.

GT comes from the same infos pkl the dataset reads, so evaluation works
without the nuScenes DB; results can also be exported in the official
submission JSON (eval/results.py) for the devkit.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

CLASSES = ('car', 'truck', 'trailer', 'bus', 'construction_vehicle',
           'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone', 'barrier')
DIST_THS = (0.5, 1.0, 2.0, 4.0)
TP_DIST_TH = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
TP_METRICS = ('trans_err', 'scale_err', 'orient_err', 'vel_err', 'attr_err')
# classes where some TP metrics are undefined (devkit convention)
NO_VEL = {'barrier', 'traffic_cone'}
NO_ORIENT = {'traffic_cone'}
NO_ATTR = {'barrier', 'traffic_cone'}


def _center_dist(pred_xy: np.ndarray, gt_xy: np.ndarray) -> np.ndarray:
    return np.linalg.norm(pred_xy[:, None] - gt_xy[None], axis=-1)


def _scale_iou(pred_wlh: np.ndarray, gt_wlh: np.ndarray) -> float:
    """Aligned 3D IoU of sizes only (devkit scale_iou)."""
    mins = np.minimum(pred_wlh, gt_wlh)
    inter = mins.prod()
    union = pred_wlh.prod() + gt_wlh.prod() - inter
    return float(inter / max(union, 1e-9))


def _yaw_diff(a: float, b: float, period: float = 2 * np.pi) -> float:
    d = (a - b) % period
    if d > period / 2:
        d = period - d
    return abs(d)


def accumulate(preds: List[dict], gts: List[dict], cls: str, dist_th: float
               ) -> Tuple[np.ndarray, np.ndarray, int, Dict[str, List[float]]]:
    """Match one class at one threshold over all samples.

    preds/gts: per-sample dicts {boxes [N, 9], names [N], scores [N] (preds),
    attrs optional}.  Returns (tp flags sorted by score desc, scores, npos,
    per-match tp errors)."""
    all_scores, all_tp = [], []
    errors: Dict[str, List[float]] = {m: [] for m in TP_METRICS}
    npos = 0
    for pred, gt in zip(preds, gts):
        gmask = gt['names'] == cls
        gboxes = gt['boxes'][gmask]
        gattrs = gt.get('attrs')
        gattrs = gattrs[gmask] if gattrs is not None else None
        npos += len(gboxes)
        pmask = pred['names'] == cls
        pboxes = pred['boxes'][pmask]
        pscores = pred['scores'][pmask]
        pattrs = pred.get('attrs')
        pattrs = pattrs[pmask] if pattrs is not None else None
        order = np.argsort(-pscores)
        taken = np.zeros(len(gboxes), bool)
        for pi in order:
            all_scores.append(pscores[pi])
            if len(gboxes) == 0:
                all_tp.append(0)
                continue
            d = np.linalg.norm(pboxes[pi, :2] - gboxes[:, :2], axis=-1)
            d[taken] = np.inf
            gi = int(d.argmin())
            if d[gi] < dist_th:
                taken[gi] = True
                all_tp.append(1)
                errors['trans_err'].append(float(d[gi]))
                errors['scale_err'].append(
                    1.0 - _scale_iou(pboxes[pi, 3:6], gboxes[gi, 3:6]))
                period = np.pi if cls == 'barrier' else 2 * np.pi
                errors['orient_err'].append(
                    0.0 if cls in NO_ORIENT else
                    _yaw_diff(pboxes[pi, 6], gboxes[gi, 6], period))
                errors['vel_err'].append(
                    0.0 if cls in NO_VEL else float(np.linalg.norm(
                        pboxes[pi, 7:9] - gboxes[gi, 7:9])))
                if cls in NO_ATTR or pattrs is None or gattrs is None:
                    errors['attr_err'].append(0.0)
                else:
                    errors['attr_err'].append(
                        0.0 if pattrs[pi] == gattrs[gi] else 1.0)
            else:
                all_tp.append(0)
    scores = np.asarray(all_scores)
    tp = np.asarray(all_tp)
    order = np.argsort(-scores)
    return tp[order], scores[order], npos, errors


def average_precision(tp: np.ndarray, npos: int) -> float:
    """101-point interpolated AP with min recall/precision 0.1 (devkit)."""
    if npos == 0 or len(tp) == 0:
        return float('nan') if npos == 0 else 0.0
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(1 - tp)
    prec = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    rec = cum_tp / npos
    rec_interp = np.linspace(0, 1, 101)
    prec_i = np.interp(rec_interp, rec, prec, right=0)
    prec_i = prec_i[rec_interp > MIN_RECALL]
    prec_i = np.clip(prec_i - MIN_PRECISION, 0, None)
    return float(prec_i.sum() / (len(prec_i) * (1 - MIN_PRECISION)))


def tp_error_mean(errors: List[float], tp: np.ndarray, npos: int) -> float:
    """devkit calc_tp: cumulative mean of TP errors interpolated onto the
    101-point recall grid, averaged between MIN_RECALL and the max achieved
    recall."""
    if npos == 0:
        return float('nan')
    if len(errors) == 0 or len(tp) == 0 or tp.sum() == 0:
        return 1.0
    e = np.asarray(errors, np.float64)           # per-match, score-desc order
    cum_mean = np.cumsum(e) / np.arange(1, len(e) + 1)
    # recall achieved at each MATCH (tp entries only)
    rec_at_match = np.arange(1, len(e) + 1) / npos
    rec_interp = np.linspace(0, 1, 101)
    max_rec = rec_at_match[-1]
    sel = (rec_interp > MIN_RECALL) & (rec_interp <= max_rec + 1e-9)
    if not sel.any():
        return 1.0
    vals = np.interp(rec_interp[sel], rec_at_match, cum_mean)
    return float(vals.mean())


def evaluate(preds: List[dict], gts: List[dict],
             classes: Sequence[str] = CLASSES) -> Dict[str, float]:
    """Full metric suite.  preds/gts are parallel per-sample lists with keys
    boxes [N, 9] (x, y, z, w, l, h, yaw, vx, vy), names [N] (str array),
    scores [N] (preds only), attrs [N] optional.
    """
    metrics: Dict[str, float] = {}
    aps = []
    tp_errs = {m: [] for m in TP_METRICS}
    for cls in classes:
        cls_aps = []
        for th in DIST_THS:
            tp, scores, npos, errors = accumulate(preds, gts, cls, th)
            ap = average_precision(tp, npos)
            cls_aps.append(ap)
            if th == TP_DIST_TH:
                for m in TP_METRICS:
                    v = tp_error_mean(errors[m], tp, npos)
                    if not np.isnan(v):
                        skip = ((m == 'vel_err' and cls in NO_VEL) or
                                (m == 'orient_err' and cls in NO_ORIENT) or
                                (m == 'attr_err' and cls in NO_ATTR))
                        if not skip:
                            tp_errs[m].append(v)
                        metrics[f'{cls}_{m}'] = v
        cls_ap = np.nanmean(cls_aps)
        metrics[f'{cls}_AP'] = float(cls_ap)
        if not np.isnan(cls_ap):
            aps.append(cls_ap)
    mAP = float(np.mean(aps)) if aps else 0.0
    metrics['mAP'] = mAP
    nds_terms = [5 * mAP]
    for m in TP_METRICS:
        mtp = float(np.mean(tp_errs[m])) if tp_errs[m] else 1.0
        metrics[f'm{m}'] = mtp
        nds_terms.append(max(0.0, 1.0 - min(1.0, mtp)))
    metrics['NDS'] = float(sum(nds_terms) / 10.0)
    return metrics
