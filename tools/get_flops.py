#!/usr/bin/env python
"""Model complexity report (replaces tools/analysis_tools/get_flops.py).

Uses XLA's cost analysis on the compiled forward.

  python tools/get_flops.py <config> [--cfg-options ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np  # noqa: E402

from common import build_model, load_cli_config  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='*', default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mv2d_tpu.core.geometry import prepare_camera_params
    from __graft_entry__ import _rig

    cfg = load_cli_config(args.config, args.cfg_options)
    model = build_model(cfg)
    mc = model.cfg
    V = mc.total_views
    K, E = _rig(V, mc.image_size)
    ts = [0.0] * mc.num_views + [0.5] * (V - mc.num_views)
    cam = prepare_camera_params(K, E, timestamps=ts)
    imgs = jnp.zeros((V, *mc.image_size, 3), jnp.float32)
    shapes = jnp.asarray([[*mc.image_size]] * V)
    struct = jax.eval_shape(model.init, jax.random.PRNGKey(0), imgs, cam,
                            shapes)
    n_params = sum(int(np.prod(s.shape))
                   for s in jax.tree.leaves(struct['params']))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), struct)
    lowered = jax.jit(lambda v, i: model.apply(v, i, cam, shapes)).lower(
        variables, imgs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get('flops', float('nan'))
    bytes_ = ca.get('bytes accessed', float('nan'))
    print(f'params:          {n_params / 1e6:.2f} M')
    print(f'forward flops:   {flops / 1e9:.1f} GFLOPs / sample '
          f'({V} views @ {mc.image_size})')
    print(f'bytes accessed:  {bytes_ / 1e9:.2f} GB')


if __name__ == '__main__':
    main()
