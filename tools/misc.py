#!/usr/bin/env python
"""Misc utilities (mirrors tools/misc/* of the reference).

  python tools/misc.py print_config <config>
  python tools/misc.py publish <ckpt_dir> <out_dir>     # strip opt state
  python tools/misc.py browse <config> --index 0        # dump sample stats
  python tools/misc.py update_data_coords <in.pkl> <out.pkl>
  python tools/misc.py fuse_conv_bn <ckpt_dir> <out_dir>
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np  # noqa: E402

from common import build_dataset, load_cli_config  # noqa: E402


def print_config(args):
    cfg = load_cli_config(args.config, args.cfg_options)
    print(json.dumps(cfg, indent=2, default=str))


def publish(args):
    """Strip optimizer state from a TrainState checkpoint -> params-only
    (the reference's publish_model.py)."""
    from mv2d_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(os.path.abspath(args.src))
    out = {'params': raw['params']}
    if 'constants' in raw:
        out['constants'] = raw['constants']
    save_checkpoint(args.dst, out)
    print('published params-only checkpoint to', args.dst)


def browse(args):
    cfg = load_cli_config(args.config, args.cfg_options)
    ds = build_dataset(cfg, 'train' if not args.val else 'val')
    s = ds.get_sample(args.index, np.random.default_rng(0))
    for k, v in s.items():
        if isinstance(v, np.ndarray):
            print(f'{k:16s} {v.shape} {v.dtype} '
                  f'[{np.asarray(v, np.float64).min():.3f}, '
                  f'{np.asarray(v, np.float64).max():.3f}]')
        else:
            print(f'{k:16s} {v}')


def update_data_coords(args):
    """Migrate pre-v1.0 mmdet3d infos pkls to the current LiDAR box
    convention (the reference's tools/update_data_coords.py): old boxes are
    (x, y, z, w, l, h, yaw_old) with yaw measured from +x clockwise; the
    v1.0 convention is (x, y, z, l, w, h, yaw) with yaw = -yaw_old - pi/2.
    Current-format pkls (metadata version tag >= 1.0) pass through."""
    import pickle
    with open(args.src, 'rb') as f:
        data = pickle.load(f)
    infos = data['infos'] if isinstance(data, dict) else data
    meta = data.get('metadata', {}) if isinstance(data, dict) else {}
    ver = str(meta.get('version_coords', meta.get('coord_version', '')))
    if ver.startswith('1.'):
        print('already v1.0 coords; copying through')
    else:
        for info in infos:
            gt = np.asarray(info.get('gt_boxes', np.zeros((0, 7))),
                            np.float64)
            if gt.size:
                gt = gt.copy()
                gt[:, [3, 4]] = gt[:, [4, 3]]            # w,l -> l,w
                gt[:, 6] = -gt[:, 6] - np.pi / 2
                info['gt_boxes'] = gt
        meta = dict(meta, coord_version='1.0')
    out = {'infos': infos, 'metadata': meta}
    with open(args.dst, 'wb') as f:
        pickle.dump(out, f)
    print(f'wrote {len(infos)} infos to {args.dst}')


def fuse_conv_bn(args):
    """Write a checkpoint whose FrozenBatchNorm stats are pre-folded into
    the conv kernels (the reference's tools/misc/fuse_conv_bn.py).

    mv2d_tpu folds frozen-BN affines into conv weights at trace time
    (nn/resnet.py FoldedConv), so inference speed is identical either way;
    this tool exists for exporting externally-consumable weights.  After
    folding, BN scale=1 / bias=0 / mean=0 / var=1, so the fused checkpoint
    still loads into the unmodified model."""
    from mv2d_tpu.train.checkpoint import save_checkpoint
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(os.path.abspath(args.src))
    params = raw['params']
    constants = raw.get('constants', {})
    n = 0

    def walk(p, c):
        nonlocal n
        for name in list(p):
            child = p[name]
            if not isinstance(child, dict):
                continue
            # bottleneck conv/bn sibling pairs: convX + bnX, downsample
            pairs = [('conv1', 'bn1'), ('conv2', 'bn2'), ('conv3', 'bn3'),
                     ('downsample_conv', 'downsample_bn'),
                     ('stem_conv', 'stem_bn')]
            for conv, bn in pairs:
                if (conv in child and bn in child
                        and bn in c.get(name, {})):
                    k = np.asarray(child[conv]['kernel'])
                    g = np.asarray(child[bn]['scale'])
                    b = np.asarray(child[bn]['bias'])
                    mean = np.asarray(c[name][bn]['mean'])
                    var = np.asarray(c[name][bn]['var'])
                    s = g / np.sqrt(var + 1e-5)
                    child[conv]['kernel'] = k * s
                    child[bn]['scale'] = np.ones_like(g)
                    child[bn]['bias'] = b - mean * s
                    c[name][bn]['mean'] = np.zeros_like(mean)
                    c[name][bn]['var'] = np.ones_like(var)
                    n += 1
            walk(child, c.get(name, {}))

    walk(params, constants)
    out = {'params': params}
    if constants:
        out['constants'] = constants
    save_checkpoint(args.dst, out)
    print(f'fused {n} conv+bn pairs -> {args.dst}')


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='task', required=True)
    pc = sub.add_parser('print_config')
    pc.add_argument('config')
    pc.add_argument('--cfg-options', nargs='*', default=None)
    pub = sub.add_parser('publish')
    pub.add_argument('src')
    pub.add_argument('dst')
    br = sub.add_parser('browse')
    br.add_argument('config')
    br.add_argument('--index', type=int, default=0)
    br.add_argument('--val', action='store_true')
    br.add_argument('--cfg-options', nargs='*', default=None)
    uc = sub.add_parser('update_data_coords')
    uc.add_argument('src')
    uc.add_argument('dst')
    fb = sub.add_parser('fuse_conv_bn')
    fb.add_argument('src')
    fb.add_argument('dst')
    args = p.parse_args()
    dict(print_config=print_config, publish=publish, browse=browse,
         update_data_coords=update_data_coords,
         fuse_conv_bn=fuse_conv_bn)[args.task](args)


if __name__ == '__main__':
    main()
