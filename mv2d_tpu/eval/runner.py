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
             collect_submission: bool = False,
             data_parallel: bool = True
             ) -> Tuple[Dict[str, float], Optional[dict]]:
    """Returns (metrics, submission_json_or_None).

    With multiple devices and data_parallel=True, samples are evaluated in
    device-count-sized groups sharded over a 1-axis mesh (replaces the
    reference's multi_gpu_test + collect, tools/test.py:241-250)."""
    import jax
    import jax.numpy as jnp

    D = jax.device_count() if data_parallel else 1
    n = min(max_samples or len(dataset), len(dataset))

    if D > 1:
        from ..parallel.mesh import batch_sharding, make_mesh, replicated
        mesh = make_mesh()
        fwd = jax.jit(
            lambda v, i, c, sh: jax.vmap(
                lambda ii, cc, ss: model.apply(v, ii, cc, ss))(i, c, sh),
            in_shardings=(replicated(mesh), batch_sharding(mesh),
                          batch_sharding(mesh), batch_sharding(mesh)),
            out_shardings=replicated(mesh))
    else:
        fwd = jax.jit(lambda v, i, c, sh: model.apply(v, i, c, sh))

    preds: List[dict] = []
    gts: List[dict] = []
    tokens: List[str] = []
    pf = Prefetcher(dataset, list(range(n)), seed=0)
    t0 = time.time()
    done = 0
    group: List = []

    def flush(group):
        nonlocal done
        if not group:
            return
        if D > 1:
            pad = D - len(group)
            inputs = [to_eval_inputs(s) for _, s in group]
            inputs += [inputs[-1]] * pad
            imgs, cam, shapes = jax.tree.map(
                lambda *xs: jnp.stack(xs), *inputs)
            out = jax.device_get(fwd(variables, imgs, cam, shapes))
            for gi, (idx, s) in enumerate(group):
                boxes, scores, labels, valid = (out[0][gi], out[1][gi],
                                                out[2][gi], out[3][gi])
                preds.append(res.boxes_to_pred_dict(
                    boxes, scores, labels, valid, info=dataset.get_info(idx)))
                gts.append(res.gt_dict_from_info(dataset.get_info(idx)))
                tokens.append(s['token'])
        else:
            idx, s = group[0]
            imgs, cam, shapes = to_eval_inputs(s)
            boxes, scores, labels, valid = jax.device_get(
                fwd(variables, imgs, cam, shapes))
            preds.append(res.boxes_to_pred_dict(
                boxes, scores, labels, valid, info=dataset.get_info(idx)))
            gts.append(res.gt_dict_from_info(dataset.get_info(idx)))
            tokens.append(s['token'])
        done += len(group)
        if verbose and done % 48 < len(group):
            print(f'eval {done}/{n}  '
                  f'{done / (time.time() - t0):.2f} samples/s', flush=True)

    for idx, s in pf:
        group.append((idx, s))
        if len(group) == D:
            flush(group)
            group = []
    flush(group)
    pf.close()
    metrics = nuscenes_eval.evaluate(preds, gts)
    submission = None
    if collect_submission:
        infos_by_token = {i['token']: i for i in dataset.infos}
        submission = res.to_nuscenes_submission(tokens, preds, infos_by_token)
    return metrics, submission
