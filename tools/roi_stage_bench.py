#!/usr/bin/env python
"""Decompose the RoI head's eval cost (align / querygen / corr / masks /
keys / decoder / decode+merge) as separate jitted programs.

  python tools/roi_stage_bench.py [piece ...]   pieces default to all
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
    print(f'{name:40s} {dt * 1000:8.2f} ms', flush=True)
    return dt


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    from mv2d_tpu import configs
    from mv2d_tpu.core.geometry import (prepare_camera_params,
                                        virtual_intrinsics)
    from mv2d_tpu.models.correlation import (adjacency_from_correlation,
                                             epipolar_in_box,
                                             gather_active_keys,
                                             in_roi_pixel_masks,
                                             query_pixel_masks)
    from mv2d_tpu.models.mv2d import MV2D
    from mv2d_tpu.ops.roi_align import roi_align
    from __graft_entry__ import _rig

    pieces = [a for a in sys.argv[1:] if not a.startswith('--')] or [
        'align', 'align_pallas', 'querygen', 'corr', 'masks', 'keys',
        'decoder', 'decode']

    cfg = configs.mv2d_t_r50()
    V = cfg.total_views
    K, E = _rig(V, cfg.image_size)
    cam = prepare_camera_params(K, E, timestamps=[0.0] * 6 + [0.5] * 6)
    rng = np.random.default_rng(0)
    h, w = cfg.image_size[0] // cfg.stride, cfg.image_size[1] // cfg.stride
    C = 256
    P = cfg.proposal_test.max_per_img
    R = V * P
    p4 = jnp.asarray(rng.normal(size=(V, h, w, C)), jnp.bfloat16)
    pos = jnp.asarray(rng.normal(size=(V, h, w, C)), jnp.bfloat16)
    # synthetic proposals: valid boxes spread over each view
    bx = rng.uniform(0, cfg.image_size[1] - 220, (V, P, 1))
    by = rng.uniform(0, cfg.image_size[0] - 220, (V, P, 1))
    bw = rng.uniform(24, 200, (V, P, 2))
    boxes = jnp.asarray(
        np.concatenate([bx, by, bx + bw[..., :1], by + bw[..., 1:]], -1),
        jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(V, P)) < 0.8)
    flat_boxes = boxes.reshape(R, 4)
    view_idx = jnp.repeat(jnp.arange(V), P)

    model = MV2D(cfg)

    if 'align' in pieces:
        cat = jnp.concatenate([p4, pos], axis=-1)
        timed(jax.jit(lambda c_, b: roi_align(
            c_, b, view_idx, 1.0 / cfg.stride, cfg.roi_size,
            sampling_ratio=2, chunk=512)), cat, flat_boxes,
            name=f'roi head align (XLA gather, {R} RoIs)')

    if 'align_sep' in pieces:
        from mv2d_tpu.ops.roi_align import separable_roi_align_views
        cat = jnp.concatenate([p4, pos], axis=-1)
        timed(jax.jit(lambda c_, b: separable_roi_align_views(
            c_, b, 1.0 / cfg.stride, output_size=cfg.roi_size,
            sampling_ratio=2)), cat, boxes,
            name=f'roi head align (separable mm, {R} RoIs)')

    if 'align_pallas' in pieces:
        from mv2d_tpu.ops.pallas_roi_align import pallas_roi_align_views
        cat = jnp.concatenate([p4, pos], axis=-1)
        timed(jax.jit(lambda c_, b: pallas_roi_align_views(
            [c_], b, [cfg.stride], output_size=cfg.roi_size,
            sampling_ratio=2)), cat, boxes,
            name=f'roi head align (pallas slab, {R} RoIs)')

    if 'querygen' in pieces:
        from mv2d_tpu.nn.query_generator import QueryGenerator
        qgm = QueryGenerator()
        bf = jnp.asarray(rng.normal(size=(R, cfg.roi_size, cfg.roi_size, C)),
                         jnp.bfloat16)
        Kv = virtual_intrinsics(flat_boxes, cam.intrinsics[view_idx],
                                (cfg.roi_size, cfg.roi_size))
        ok = jnp.ones((R,), bool)
        qv = qgm.init(jax.random.PRNGKey(0), bf, Kv,
                      cam.ext_t_inv[view_idx], ok)
        qv = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, qv)
        timed(jax.jit(lambda v_, b: qgm.apply(v_, b, Kv,
                                              cam.ext_t_inv[view_idx], ok)),
              qv, bf, name='query generator')

    corr_ids = corr_mask = None
    if 'corr' in pieces or 'masks' in pieces:
        corr_j = jax.jit(lambda b, v: epipolar_in_box(
            b, v, cam.trans_mats, cfg.image_size, cfg.correlation))
        corr_ids, corr_mask = corr_j(boxes, valid)
        if 'corr' in pieces:
            timed(corr_j, boxes, valid, name='epipolar correlation')

    if 'masks' in pieces:
        def masks_fn(b, v, ci, cm):
            # mirrors the deployed key-column-first path (models/mv2d.py)
            in_roi = in_roi_pixel_masks(b, v, (h, w), cfg.stride,
                                        cfg.correlation.expand_stride)
            A = adjacency_from_correlation(ci, cm, R)
            qact = A.any(axis=0).reshape(V, P)
            union = (in_roi & qact[:, :, None]).any(axis=1).reshape(-1)
            key_idx, key_active = gather_active_keys(union, cfg.k_max)
            keys = p4.reshape(V * h * w, C)[key_idx]
            key_pos = pos.reshape(V * h * w, C)[key_idx]
            vk = key_idx // (h * w)
            ik = key_idx % (h * w)
            G = in_roi[:, :, ik] & (jnp.arange(V)[:, None, None]
                                    == vk[None, None, :])
            hits = jnp.einsum('rvp,vpk->rk',
                              A.reshape(R, V, P).astype(jnp.bfloat16),
                              G.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            cross = (hits > 0.5) & key_active[None]
            return keys, key_pos, cross
        timed(jax.jit(masks_fn), boxes, valid, corr_ids, corr_mask,
              name='pixel masks + key gather')

    if 'decoder' in pieces:
        from mv2d_tpu.nn.decoder import CrossAttentionBoxHead
        head = CrossAttentionBoxHead(
            num_classes=cfg.num_classes, embed_dims=cfg.embed_dims,
            num_layers=cfg.num_decoder_layers, num_heads=cfg.num_heads,
            pc_range=cfg.pc_range, use_flash=cfg.use_flash_attention)
        refs = jnp.asarray(rng.uniform(0.1, 0.9, (R, 3)), jnp.float32)
        keys = jnp.asarray(rng.normal(size=(cfg.k_max, C)), jnp.bfloat16)
        kpos = jnp.asarray(rng.normal(size=(cfg.k_max, C)), jnp.bfloat16)
        cross = jnp.asarray(rng.uniform(size=(R, cfg.k_max)) < 0.05)
        hv = head.init(jax.random.PRNGKey(0), refs, keys, kpos, None, cross,
                       True)
        hv = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, hv)
        timed(jax.jit(lambda v_, r, k, kp, cr: head.apply(
            v_, r, k, kp, None, cr, True)), hv, refs, keys, kpos, cross,
            name=f'decoder stack ({cfg.num_decoder_layers} layers)')

    if 'decode' in pieces:
        from mv2d_tpu.core.coder import nms_free_decode
        from mv2d_tpu.core.nms import box3d_multiclass_nms
        cls = jnp.asarray(rng.normal(size=(R, cfg.num_classes)),
                          jnp.float32)
        bp = jnp.asarray(rng.normal(size=(R, 10)), jnp.float32)

        def decode_fn(c_, b_):
            return nms_free_decode(c_, b_, jnp.ones((R,), bool),
                                   cfg.max_num, cfg.num_classes,
                                   cfg.position_range)
        timed(jax.jit(decode_fn), cls, bp, name='NMS-free decode')


if __name__ == '__main__':
    main()
