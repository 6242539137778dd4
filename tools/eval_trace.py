#!/usr/bin/env python
"""Capture an xplane device trace of the bench.py eval forward.

  python tools/eval_trace.py /tmp/eval_trace [--steps 3]
  python tools/trace_summary.py /tmp/eval_trace --steps 3
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('trace_dir')
    p.add_argument('--steps', type=int, default=3)
    args = p.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    import numpy as np
    from mv2d_tpu import configs
    from mv2d_tpu.core.geometry import prepare_camera_params
    from mv2d_tpu.models.mv2d import MV2D
    sys.path.insert(0, '.')
    from __graft_entry__ import _rig

    cfg = configs.mv2d_t_r50()
    V = cfg.total_views
    K, E = _rig(V, cfg.image_size)
    cam = prepare_camera_params(K, E, timestamps=[0.0] * 6 + [0.5] * 6)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)),
                       dtype=jnp.float32)
    img_shapes = jnp.asarray([[*cfg.image_size]] * V)
    model = MV2D(cfg)
    struct = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs, cam,
                            img_shapes)
    host_rng = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            host_rng.normal(0, 0.02, s.shape).astype(s.dtype)
            if np.issubdtype(s.dtype, np.floating)
            else np.zeros(s.shape, s.dtype)), struct)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    from mv2d_tpu.data.padding import s2d_fold_images
    imgs = jnp.asarray(s2d_fold_images(np.asarray(imgs)), jnp.bfloat16)
    fwd = jax.jit(lambda v, i: model.apply(v, i, cam, img_shapes))

    def force(out):
        return jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])

    # same AUTO-layout input pre-placement as bench.py - without it the
    # trace carries a ~2.2 ms/step relayout copy of the image parameter
    # that the bench never pays, skewing the stage split
    try:
        from jax.experimental.layout import Format, Layout
        f = jax.jit(lambda v, i: model.apply(v, i, cam, img_shapes),
                    in_shardings=Format(Layout.AUTO))
        compiled = f.lower(variables, imgs).compile()
        fmts = compiled.input_formats[0]
        variables, imgs = jax.tree.map(jax.device_put, (variables, imgs),
                                       fmts)
        fwd = compiled
    except Exception as e:
        print('auto-layout unavailable, tracing default layouts:', e)

    force(fwd(variables, imgs))
    force(fwd(variables, imgs))
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            out = fwd(variables, imgs)
        force(out)
    print('trace written to', args.trace_dir)


if __name__ == '__main__':
    main()
