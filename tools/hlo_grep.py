#!/usr/bin/env python
"""Compile the bench.py eval forward and grep its optimized HLO.

  python tools/hlo_grep.py 'copy.3717' 'copy.3699'
  python tools/hlo_grep.py --list-copies      # all copy/transpose-like ops

Instruction names match the xplane trace (same executable), so this
resolves trace rows whose source is '?'.
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('names', nargs='*')
    p.add_argument('--list-copies', action='store_true')
    p.add_argument('--context', type=int, default=3,
                   help='lines of HLO context around each hit')
    p.add_argument('--out', default=None, help='also write full HLO here')
    args = p.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.layout import Format, Layout
    from mv2d_tpu import configs
    from mv2d_tpu.core.geometry import prepare_camera_params
    from mv2d_tpu.data.padding import s2d_fold_images
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
    variables = model.init(jax.random.PRNGKey(0), imgs, cam, img_shapes)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables)
    im = jnp.asarray(s2d_fold_images(np.asarray(imgs)), jnp.bfloat16)

    f = jax.jit(lambda v, i: model.apply(v, i, cam, img_shapes),
                in_shardings=Format(Layout.AUTO))
    compiled = f.lower(variables, im).compile()
    txt = compiled.as_text()
    if args.out:
        with open(args.out, 'w') as fh:
            fh.write(txt)
        print(f'wrote {len(txt)} bytes to {args.out}')

    lines = txt.splitlines()
    if args.list_copies:
        for i, ln in enumerate(lines):
            if re.search(r'%?(copy|transpose|bitcast-convert)\.\d+ = ', ln):
                print(ln.strip()[:220])
        return
    for name in args.names:
        pat = re.compile(r'%?' + re.escape(name) + r'\b')
        for i, ln in enumerate(lines):
            if pat.search(ln):
                lo = max(0, i - args.context)
                hi = min(len(lines), i + args.context + 1)
                print(f'---- {name} @ line {i}')
                for j in range(lo, hi):
                    print(lines[j].strip()[:240])


if __name__ == '__main__':
    main()
