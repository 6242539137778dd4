#!/usr/bin/env python
"""Decompose the training step: forward-only vs backward vs loss pieces.

  python tools/train_stage_bench.py [--no-remat]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np


def timed(fn, *args, iters=8, name=''):
    import jax
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    for _ in range(2):
        fn(*args)
    jax.device_get(jax.tree.leaves(fn(*args))[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:44s} {dt * 1000:8.1f} ms', flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--no-remat', action='store_true')
    p.add_argument('--stage', type=int, default=-1,
                   help='run only this stage (1-4); four big programs in '
                        'one process can exhaust HBM on the remote worker')
    args = p.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    from mv2d_tpu import configs
    from mv2d_tpu.core.geometry import prepare_camera_params
    from mv2d_tpu.models.mv2d import MV2D, GroundTruth2D, GroundTruth3D
    from mv2d_tpu.train.optim import make_optimizer
    from mv2d_tpu.train.train_step import (TrainBatch, compute_losses,
                                           init_train_state, make_train_step)
    from __graft_entry__ import _rig

    cfg = configs.mv2d_t_r50(remat=not args.no_remat)
    V = cfg.total_views
    K, E = _rig(V, cfg.image_size)
    cam = prepare_camera_params(K, E, timestamps=[0.0] * 6 + [0.5] * 6)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)),
                       dtype=jnp.float32)
    shapes = jnp.asarray([[*cfg.image_size]] * V)
    G2, G = 32, cfg.max_gt
    g2b = np.zeros((V, G2, 4), np.float32)
    g2v = np.zeros((V, G2), bool)
    for v in range(V):
        n = rng.integers(5, 20)
        xy = rng.uniform(0, cfg.image_size[1] - 200, (n, 2))
        g2b[v, :n] = np.concatenate([xy, xy + rng.uniform(40, 200, (n, 2))],
                                    1)
        g2v[v, :n] = True
    gt2d = GroundTruth2D(boxes=jnp.asarray(g2b),
                         labels=jnp.zeros((V, G2), jnp.int32),
                         valid=jnp.asarray(g2v))
    g3b = np.zeros((G, 9), np.float32)
    ngt = 25
    g3b[:ngt, :2] = rng.uniform(-40, 40, (ngt, 2))
    g3b[:ngt, 2] = -1.5
    g3b[:ngt, 3:6] = rng.uniform(1, 4, (ngt, 3))
    gt3d = GroundTruth3D(boxes=jnp.asarray(g3b),
                         labels=jnp.asarray(rng.integers(0, 10, G),
                                            dtype=jnp.int32),
                         valid=jnp.asarray(np.arange(G) < ngt))
    batch = TrainBatch(imgs=imgs, cam=cam, img_shapes=shapes, gt2d=gt2d,
                       gt3d=gt3d)

    model = MV2D(cfg)
    init_fn = jax.jit(lambda r, *a: model.init(
        r, *a, method=MV2D.forward_train))
    variables = init_fn(
        {'params': jax.random.PRNGKey(0), 'aug': jax.random.PRNGKey(1),
         'dn': jax.random.PRNGKey(2), 'dropout': jax.random.PRNGKey(3)},
        imgs, cam, shapes, gt2d, gt3d)

    rng_j = jax.random.PRNGKey(5)

    want = lambda i: args.stage in (-1, i)

    if want(1):
        # 1. model forward only (no losses)
        def fwd_only(v, b, r):
            vb = dict(v)
            vb['params'] = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, vb['params'])
            r_aug, r_dn, r_drop = jax.random.split(r, 3)
            return model.apply(vb, b.imgs.astype(jnp.bfloat16), b.cam,
                               b.img_shapes, b.gt2d, b.gt3d,
                               method=MV2D.forward_train,
                               rngs={'aug': r_aug, 'dn': r_dn,
                                     'dropout': r_drop})[0].all_cls_scores
        timed(jax.jit(fwd_only), variables, batch, rng_j,
              name='model forward_train only')

    if want(2):
        # 2. losses forward (incl Hungarian JV + 2D losses)
        def loss_fwd(v, b, r):
            return compute_losses(model, v, b, r)[0]
        timed(jax.jit(loss_fwd), variables, batch, rng_j,
              name='compute_losses forward (incl JV matching)')

    if want(3):
        # 3. value_and_grad
        def vg(v, b, r):
            def f(params):
                return compute_losses(
                    model, {'params': params,
                            'constants': v.get('constants', {})}, b, r)[0]
            return jax.value_and_grad(f)(v['params'])[0]
        timed(jax.jit(vg), variables, batch, rng_j,
              name='value_and_grad (fwd+bwd)')

    if want(4):
        # 4. full train step (incl optimizer)
        tx = make_optimizer(variables['params'], total_steps=1000)
        state = init_train_state(model, variables, tx)
        step = jax.jit(make_train_step(model, tx))
        timed(lambda s, b, r: step(s, b, r)[1]['total_loss'], state, batch,
              rng_j, name='full train step (fwd+bwd+AdamW)')


if __name__ == '__main__':
    main()
