#!/usr/bin/env python
"""Model export for serving (replaces tools/deployment/* torchserve packaging).

Serializes the jitted inference forward to a portable StableHLO artifact via
jax.export, plus the parameters (orbax).  The artifact can be reloaded and
executed on any device with jax.export.deserialize - no Python model code
needed at serving time.

  python tools/export.py <config> --checkpoint ckpt --out export_dir
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
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--out', required=True)
    p.add_argument('--cfg-options', nargs='*', default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from mv2d_tpu.core.geometry import prepare_camera_params
    from mv2d_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
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
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, cam, shapes)
    if args.checkpoint:
        variables = restore_checkpoint(args.checkpoint, variables)

    # exported signature: (imgs, flattened camera matrices) -> detections
    def serve(images, intrinsics, extrinsics, img2lidar, ext_t_inv,
              trans_mats, timestamps, img_shapes):
        from mv2d_tpu.core.geometry import CameraParams
        cam_in = CameraParams(
            intrinsics=intrinsics, extrinsics=extrinsics,
            lidar2img=jnp.einsum('vij,vkj->vik', intrinsics, extrinsics),
            img2lidar=img2lidar, ext_t_inv=ext_t_inv, trans_mats=trans_mats,
            timestamps=timestamps)
        return model.apply(variables, images, cam_in, img_shapes)

    exp = jexport.export(jax.jit(serve))(
        imgs, cam.intrinsics, cam.extrinsics, cam.img2lidar, cam.ext_t_inv,
        cam.trans_mats, cam.timestamps, shapes)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, 'mv2d_forward.bin'), 'wb') as f:
        f.write(exp.serialize())
    save_checkpoint(os.path.join(args.out, 'params'),
                    jax.device_get(variables))
    print(f'exported StableHLO forward + params to {args.out}')
    print('load with: jax.export.deserialize(open(...).read()).call(...)')


if __name__ == '__main__':
    main()
