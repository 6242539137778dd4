#!/usr/bin/env python
"""Decompose the 2D detection stage (RPN head+NMS / R-CNN align / R-CNN
head / decode+NMS) as separate jitted programs at full eval shapes.

  python tools/detect_stage_bench.py [piece ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np


def timed(fn, *args, iters=10, name=''):
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
    print(f'{name:44s} {dt * 1000:8.2f} ms', flush=True)
    return dt


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    from mv2d_tpu import configs
    from mv2d_tpu.core.geometry import prepare_camera_params
    from mv2d_tpu.models.mv2d import MV2D
    from __graft_entry__ import _rig

    pieces = [a for a in sys.argv[1:] if not a.startswith('--')] or [
        'rpn_head', 'rpn', 'align', 'rcnn_head', 'decode']

    cfg = configs.mv2d_t_r50()
    V = cfg.total_views
    K, E = _rig(V, cfg.image_size)
    cam = prepare_camera_params(K, E, timestamps=[0.0] * 6 + [0.5] * 6)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)),
                       dtype=jnp.bfloat16)
    shapes = jnp.asarray([[*cfg.image_size]] * V)
    model = MV2D(cfg)
    struct = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            imgs.astype(jnp.float32), cam, shapes)
    hr = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(hr.normal(0, 0.02, s.shape).astype(s.dtype)
                              if np.issubdtype(s.dtype, np.floating)
                              else np.zeros(s.shape, s.dtype)), struct)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables)

    feats_j = jax.jit(lambda v, i: model.apply(
        v, i, method=MV2D.extract_feats))
    fpn_feats, p4 = feats_j(variables, imgs)
    pcfg = cfg.proposal_test

    if 'rpn_head' in pieces:
        timed(jax.jit(lambda v, f: model.apply(
            v, f, method=lambda m, f_: m.base_detector.rpn_head(f_))),
            variables, fpn_feats, name='RPN head convs (5 levels)')

    rpn_j = jax.jit(lambda v, f: model.apply(
        v, f, cfg.image_size, pcfg,
        method=lambda m, f_, s, c: m.base_detector.rpn(f_, s, c)))
    prop_boxes, prop_scores, prop_valid = rpn_j(variables, fpn_feats)
    if 'rpn' in pieces:
        timed(rpn_j, variables, fpn_feats,
              name='RPN head + proposals + NMS')

    Rp = prop_boxes.shape[1]
    if 'align' in pieces:
        from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views
        timed(jax.jit(lambda f, b: pallas_roi_align_views(
            list(f[:4]), b, [4, 8, 16, 32], output_size=7,
            sampling_ratio=2)), fpn_feats, prop_boxes,
            name=f'R-CNN align (slab kernel, {V * Rp} RoIs)')

    if 'rcnn_head' in pieces:
        rf = jnp.asarray(rng.normal(size=(V * Rp, 7, 7, 256)),
                         jnp.bfloat16)
        timed(jax.jit(lambda v, r: model.apply(
            v, r, method=lambda m, r_: m.base_detector.bbox_head(r_))),
            variables, rf, name=f'R-CNN 2FC head ({V * Rp} RoIs)')

    if 'decode' in pieces:
        from mv2d_tpu.core.nms import multiclass_nms_2d
        from mv2d_tpu.nn.rcnn import decode_detections
        cls_logits = jnp.asarray(
            rng.normal(size=(V, Rp, cfg.num_classes + 1)), jnp.float32)
        deltas = jnp.asarray(rng.normal(size=(V, Rp, cfg.num_classes * 4)),
                             jnp.float32)

        def decode_one(props, logits, dl, valid):
            boxes, scores = decode_detections(props, logits, dl,
                                              cfg.image_size,
                                              cfg.num_classes)
            return multiclass_nms_2d(
                boxes, scores, valid, pcfg.score_thr, pcfg.iou_threshold,
                pcfg.nms_pre, pcfg.max_per_img,
                min_bbox_size=pcfg.min_bbox_size)
        timed(jax.jit(jax.vmap(decode_one)), prop_boxes, cls_logits,
              deltas, prop_valid, name='R-CNN decode + multiclass NMS')


if __name__ == '__main__':
    main()
