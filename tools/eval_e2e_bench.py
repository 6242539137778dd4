#!/usr/bin/env python
"""End-to-end eval wall-clock WITH the host pipeline in the loop.

bench.py measures the device forward on device-resident pre-folded inputs;
this measures the full eval loop - Prefetcher -> decode/normalize/pad/s2d
(data/nuscenes.get_sample + to_eval_inputs) -> jit forward -> device_get -
on synthetic real-shaped data, so the host side's ability to keep the
device fed is a NUMBER next to the device-only bench (docs/PERF.md).

  python tools/eval_e2e_bench.py [--samples 24] [--repeat 3]
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--samples', type=int, default=24)
    p.add_argument('--repeat', type=int, default=3)
    args = p.parse_args()
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    import jax.numpy as jnp
    from mv2d_tpu import configs
    from mv2d_tpu.data.nuscenes import (NuScenesDataset, SampleBuckets,
                                        Prefetcher, to_eval_inputs)
    from mv2d_tpu.data.pipeline import IdaAugConfig
    from mv2d_tpu.models.mv2d import MV2D
    from tests.test_data import _fake_nuscenes

    mcfg = configs.mv2d_t_r50()
    tmp = tempfile.mkdtemp(prefix='e2e_bench_')
    n_fixture = min(args.samples, 8)   # fixture images cycle; IO cost is
    info_path, coco_path = _fake_nuscenes(tmp, n_samples=n_fixture)
    final = tuple(mcfg.image_size)
    dataset = NuScenesDataset(
        info_path=info_path, ann2d_path=coco_path,
        num_frames=mcfg.num_frames, test_mode=True, final_dim=final,
        ida=IdaAugConfig(final_dim=final, H=90, W=160),
        buckets=SampleBuckets(max_gt3d=mcfg.max_gt,
                              max_gt2d=mcfg.max_gt2d))
    model = MV2D(mcfg)
    s0 = dataset.get_sample(0, np.random.default_rng(0))
    imgs, cam, shapes = to_eval_inputs(s0)
    variables = model.init(jax.random.PRNGKey(0), imgs, cam, shapes)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x,
        variables)
    fwd = jax.jit(lambda v, i, c, sh: model.apply(v, i, c, sh))
    # warmup/compile
    out = fwd(variables, imgs, cam, shapes)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])

    idxs = [i % len(dataset) for i in range(args.samples)]
    rates = []
    for rep in range(args.repeat):
        pf = Prefetcher(dataset, idxs, seed=0)
        t0 = time.perf_counter()
        for idx, s in pf:
            imgs, cam, shapes = to_eval_inputs(s)
            out = fwd(variables, imgs, cam, shapes)
            jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
        pf.close()
        dt = time.perf_counter() - t0
        rates.append(args.samples / dt)
        print(f'rep {rep}: {rates[-1]:.3f} samples/s '
              f'({dt / args.samples * 1e3:.1f} ms/sample) incl host '
              f'pipeline', flush=True)
    print(f'e2e eval rate: {max(rates):.3f} samples/s (best of '
          f'{args.repeat}; device-only bench.py for comparison)')


if __name__ == '__main__':
    main()
