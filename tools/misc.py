#!/usr/bin/env python
"""Misc utilities (mirrors tools/misc/* of the reference).

  python tools/misc.py print_config <config>
  python tools/misc.py publish <ckpt_dir> <out_dir>     # strip opt state
  python tools/misc.py browse <config> --index 0        # dump sample stats
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
    args = p.parse_args()
    dict(print_config=print_config, publish=publish, browse=browse)[
        args.task](args)


if __name__ == '__main__':
    main()
