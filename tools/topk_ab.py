#!/usr/bin/env python
"""Bound the `fast_topk` (lax.approx_max_k) deviation with a measured A/B.

The TPU eval path selects pre-NMS candidates with approx_max_k at recall
~0.99 (core/topk.py; RPN per-level top-1000 + R-CNN multiclass pool) - a
deviation from the reference's exact torch.topk.  This runs the SAME
synthetic-fixture eval (tools/parity.py's run_val_eval dataset) twice -
MV2D_EXACT_TOPK=1 vs the default approx route - and prints both metric
dicts plus the deltas, giving the deviation a NUMBER instead of a recall
estimate.  Run on the TPU backend (approx_max_k is exact on CPU).

  python tools/topk_ab.py [--samples 2]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np


def run_once(exact: bool, samples: int, weights=None, fixture=None):
    # MV2D_EXACT_TOPK is read at TRACE time inside fast_topk: a fresh
    # process per setting would be bulletproof, but the jit caches key on
    # the traced jaxpr, and we re-jit per call below (new lambda object)
    os.environ['MV2D_EXACT_TOPK'] = '1' if exact else '0'
    import jax
    from mv2d_tpu import configs
    from mv2d_tpu.data.nuscenes import (NuScenesDataset, SampleBuckets,
                                        to_eval_inputs)
    from mv2d_tpu.data.pipeline import IdaAugConfig
    from mv2d_tpu.eval.runner import run_eval
    from mv2d_tpu.models.mv2d import MV2D
    from tests.test_data import _fake_nuscenes

    mcfg = configs.mv2d_t_r50()
    final = tuple(mcfg.image_size)
    if fixture:
        # soak fixture val split + soak-trained weights: the A/B the
        # round-4 verdict asked for (random-weight fixtures are chaotic
        # at the pre-NMS margin; trained weights measure the real tax)
        dataset = NuScenesDataset(
            info_path=os.path.join(fixture, 'infos_val.pkl'),
            ann2d_path=os.path.join(fixture, 'coco_val.json'),
            num_frames=mcfg.num_frames, test_mode=True, final_dim=final,
            buckets=SampleBuckets(max_gt3d=mcfg.max_gt,
                                  max_gt2d=mcfg.max_gt2d))
    else:
        tmp = tempfile.mkdtemp(prefix='topk_ab_')
        info_path, coco_path = _fake_nuscenes(tmp, n_samples=samples)
        dataset = NuScenesDataset(
            info_path=info_path, ann2d_path=coco_path,
            num_frames=mcfg.num_frames, test_mode=True, final_dim=final,
            ida=IdaAugConfig(final_dim=final, H=90, W=160),
            buckets=SampleBuckets(max_gt3d=mcfg.max_gt,
                                  max_gt2d=mcfg.max_gt2d))
    model = MV2D(mcfg)
    s0 = dataset.get_sample(0, np.random.default_rng(0))
    imgs, cam, shapes = to_eval_inputs(s0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, cam,
                                    shapes)
    if weights:
        from mv2d_tpu.train.checkpoint import restore_variables
        variables = restore_variables(
            weights, {'params': jax.device_get(variables['params']),
                      'constants': jax.device_get(
                          variables.get('constants', {}))})
    metrics, _ = run_eval(model, variables, dataset, max_samples=samples,
                          data_parallel=False, verbose=False)
    # raw decoded outputs per sample (metric deltas on a random-weight
    # fixture can be trivially 0-vs-0; the output-level diff is the
    # sharper bound)
    fwd = jax.jit(lambda v, i, c, sh: model.apply(v, i, c, sh))
    outs = []
    for idx in range(min(samples, len(dataset))):
        s = dataset.get_sample(idx, np.random.default_rng(0))
        imgs, cam, shapes = to_eval_inputs(s)
        outs.append(jax.device_get(fwd(variables, imgs, cam, shapes)))
    return metrics, outs


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--samples', type=int, default=2)
    p.add_argument('--weights', default=None)
    p.add_argument('--fixture', default=None)
    args = p.parse_args()
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    print('backend:', jax.default_backend())
    exact, outs_e = run_once(True, args.samples, args.weights,
                             args.fixture)
    approx, outs_a = run_once(False, args.samples, args.weights,
                              args.fixture)
    keys = sorted(set(exact) | set(approx))
    print(f'{"metric":24s} {"exact":>10s} {"approx":>10s} {"delta":>10s}')
    worst = 0.0
    for k in keys:
        e = float(exact.get(k, float("nan")))
        a = float(approx.get(k, float("nan")))
        d = a - e
        if k in ('mAP', 'NDS'):
            worst = max(worst, abs(d))
        print(f'{k:24s} {e:10.4f} {a:10.4f} {d:+10.4f}')
    print(f'max |delta| over mAP/NDS: {worst:.4f}')

    # output-level diff: kept-detection count delta and, over detections
    # kept by BOTH, the worst score / box-center deltas
    for i, (oe, oa) in enumerate(zip(outs_e, outs_a)):
        be, se, le, ve = [np.asarray(x) for x in oe]
        ba, sa, la, va = [np.asarray(x) for x in oa]
        both = ve & va
        n_diff = int((ve != va).sum())
        ds = float(np.abs(se[both] - sa[both]).max()) if both.any() else 0.
        db = float(np.abs(be[both][:, :3]
                          - ba[both][:, :3]).max()) if both.any() else 0.
        dl = int((le[both] != la[both]).sum()) if both.any() else 0
        print(f'sample {i}: kept {int(ve.sum())} exact / {int(va.sum())} '
              f'approx ({n_diff} slots differ); over common slots: '
              f'max |dscore| {ds:.2e}, max |dcenter| {db:.2e} m, '
              f'{dl} label flips')


if __name__ == '__main__':
    main()
