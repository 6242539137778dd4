"""Evaluation loop: dataset -> predictions -> nuScenes metrics.

Shared by tools/test.py and the training-time eval hook (the reference's
EvalHook, configs/mv2d/exp/*:195 evaluation.interval).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..data.nuscenes import NuScenesDataset, Prefetcher, to_eval_inputs
from . import nuscenes_eval
from . import results as res


def run_eval(model, variables, dataset: NuScenesDataset,
             max_samples: Optional[int] = None, verbose: bool = True,
             collect_submission: bool = False
             ) -> Tuple[Dict[str, float], Optional[dict]]:
    """Returns (metrics, submission_json_or_None)."""
    import jax

    fwd = jax.jit(lambda v, i, c, sh: model.apply(v, i, c, sh))
    n = min(max_samples or len(dataset), len(dataset))
    preds: List[dict] = []
    gts: List[dict] = []
    tokens: List[str] = []
    pf = Prefetcher(dataset, list(range(n)), seed=0)
    t0 = time.time()
    done = 0
    for idx, s in pf:
        imgs, cam, shapes = to_eval_inputs(s)
        boxes, scores, labels, valid = jax.device_get(
            fwd(variables, imgs, cam, shapes))
        preds.append(res.boxes_to_pred_dict(boxes, scores, labels, valid))
        gts.append(res.gt_dict_from_info(dataset.infos[idx]))
        tokens.append(s['token'])
        done += 1
        if verbose and done % 50 == 0:
            print(f'eval {done}/{n}  '
                  f'{done / (time.time() - t0):.2f} samples/s', flush=True)
    pf.close()
    metrics = nuscenes_eval.evaluate(preds, gts)
    submission = None
    if collect_submission:
        infos_by_token = {i['token']: i for i in dataset.infos}
        submission = res.to_nuscenes_submission(tokens, preds, infos_by_token)
    return metrics, submission
