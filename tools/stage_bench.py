#!/usr/bin/env python
"""Stage-wise timing of the full-size MV2D-T forward on the current backend.

Times each pipeline stage as its own jitted function to locate bottlenecks:
backbone+FPN, RPN proposals, RCNN detect, PE, roi-head (correlation+decoder),
decode+merge.
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np


def _force(out):
    """Force completion by FETCHING a value (block_until_ready on remote
    axon buffers acks enqueue, not completion).  Fetch one element so the
    transfer itself is negligible."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    return jax.device_get(leaf.reshape(-1)[0])


def timed(fn, *args, iters=10, warmup=2, name=''):
    out = fn(*args)
    _force(out)
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{name:28s} {dt * 1000:8.2f} ms', flush=True)
    return out, dt


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    from mv2d_tpu import configs
    from mv2d_tpu.core.geometry import prepare_camera_params
    from mv2d_tpu.models.mv2d import MV2D
    from __graft_entry__ import _rig

    bf16 = '--f32' not in sys.argv
    cfg = configs.mv2d_t_r50()
    if '--flash' in sys.argv:
        cfg = cfg._replace(use_flash_attention=True)
    V = cfg.total_views
    K, E = _rig(V, cfg.image_size)
    cam = prepare_camera_params(K, E, timestamps=[0.0] * 6 + [0.5] * 6)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)),
                       dtype=jnp.float32)
    shapes = jnp.asarray([[*cfg.image_size]] * V)
    model = MV2D(cfg)
    struct = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs, cam,
                            shapes)
    hr = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(hr.normal(0, 0.02, s.shape).astype(s.dtype)
                              if np.issubdtype(s.dtype, np.floating)
                              else np.zeros(s.shape, s.dtype)), struct)
    if bf16:
        cast = lambda x: x.astype(jnp.bfloat16) \
            if x.dtype == jnp.float32 else x
        variables = jax.tree.map(cast, variables)
        imgs = imgs.astype(jnp.bfloat16)

    stages = [a for a in sys.argv[1:] if not a.startswith('--')] or \
        ['feats', 'detect', 'pe', 'head', 'full']

    def feats_fn(v, i):
        return model.apply(v, i, True, method=MV2D.extract_feats)

    feats_j = jax.jit(feats_fn)
    fpn_feats, p4 = feats_j(variables, imgs)
    if 'feats' in stages:
        timed(feats_j, variables, imgs, name='backbone+FPN+neck')

    def detect_fn(v, feats):
        return model.apply(
            v, feats, cfg.image_size, cfg.proposal_test,
            method=lambda m, f, s, c: m.base_detector.detect(f, s, c))

    detect_j = jax.jit(detect_fn)
    proposals = detect_j(variables, fpn_feats)
    if 'detect' in stages:
        timed(detect_j, variables, fpn_feats,
              name='RPN+RCNN detect (12 views)')

    def pe_fn(v, p):
        return model.apply(v, p, cam.img2lidar, shapes, cfg.image_size,
                           method=lambda m, *a: m.pe(*a))

    pe_j = jax.jit(pe_fn)
    pos = pe_j(variables, p4)
    if 'pe' in stages:
        timed(pe_j, variables, p4, name='3D position embedding')

    if 'head' in stages or 'full' in stages:
        def head_fn(v, p, ps, prop):
            return model.apply(v, p, ps, prop, cam, shapes,
                               method=lambda m, p4_, pos_, pr, c, s:
                               m.roi_head_forward(p4_, pos_, pr, c, s))

        head_j = jax.jit(head_fn)
        if 'head' in stages:
            timed(head_j, variables, p4, pos, proposals,
                  name='roi head (corr+decoder)')

    if 'full' in stages:
        full = jax.jit(lambda v, i: model.apply(v, i, cam, shapes))
        timed(full, variables, imgs, name='FULL forward')


if __name__ == '__main__':
    main()
