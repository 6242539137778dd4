#!/usr/bin/env python
"""Size the model's static shape buckets from dataset statistics.

The TPU build replaces the reference's ragged shapes (per-view detection
counts, the valid-pixel key gather mv2d_head.py:161-165, DN pads) with
fixed buckets; anything past a bucket is silently dropped, so the buckets
must be sized from the data.  This tool scans the (train) dataset and
reports, with a safety margin:

  * max_gt        (3D GT boxes/scene; also DN group width)
  * max_gt2d      (2D GT boxes/view)
  * k_max         (attention-key pixel bucket: union of all per-box pixel
                   masks at feature stride, expanded by expand_stride - the
                   union over queries of own+correlated pixels equals the
                   union of all box masks, since every box is itself a
                   query).  GT boxes stand in for detections; scale by
                   --det-inflation for the detector's extra boxes
                   (detections are capped at proposal max_per_img anyway).

Run-time overflow is independently accounted: the model reports
key_active/key_overflow in ForwardOutputs.diagnostics, and train logs
carry them - a nonzero key_overflow means re-run this tool and raise
k_max.

  python tools/calibrate_buckets.py <config> [--samples 200]
      [--percentile 100] [--margin 1.25] [--det-inflation 2.0]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np  # noqa: E402

from common import build_dataset, build_model_config, load_cli_config  # noqa: E402


def _pixel_union(boxes: np.ndarray, valid: np.ndarray, hw, stride: int,
                 expand: int) -> int:
    """Active pixels in the union of box masks at feature resolution
    (mirrors models/correlation.in_roi_pixel_masks semantics)."""
    h, w = hw
    mask = np.zeros((h, w), bool)
    for b, ok in zip(boxes, valid):
        if not ok:
            continue
        x1 = int(np.floor(b[0] / stride)) - expand
        y1 = int(np.floor(b[1] / stride)) - expand
        x2 = int(np.ceil(b[2] / stride)) + expand
        y2 = int(np.ceil(b[3] / stride)) + expand
        mask[max(y1, 0):min(y2 + 1, h), max(x1, 0):min(x2 + 1, w)] = True
    return int(mask.sum())


def _round_up(x: float, q: int) -> int:
    return int(-(-x // q) * q)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--split', default='train')
    p.add_argument('--samples', type=int, default=200)
    p.add_argument('--percentile', type=float, default=100.0,
                   help='use this percentile of the per-sample stats')
    p.add_argument('--margin', type=float, default=1.25,
                   help='safety factor applied on top of the percentile')
    p.add_argument('--det-inflation', type=float, default=2.0,
                   help='k_max scale-up for detector boxes beyond GT')
    p.add_argument('--cfg-options', nargs='*', default=None)
    args = p.parse_args()

    cfg = load_cli_config(args.config, args.cfg_options)
    mcfg = build_model_config(cfg)
    ds = build_dataset(cfg, args.split)
    n = min(args.samples, len(ds))
    rng = np.random.default_rng(0)

    h = mcfg.image_size[0] // mcfg.stride
    w = mcfg.image_size[1] // mcfg.stride
    expand = mcfg.correlation.expand_stride

    gt3d_counts, gt2d_counts, unions = [], [], []
    for i in range(n):
        s = ds.get_sample(i, rng)
        gt3d_counts.append(int(np.asarray(s['gt3d_valid']).sum()))
        v2 = np.asarray(s.get('gt2d_valid', np.zeros((1, 1), bool)))
        gt2d_counts.append(int(v2.sum(axis=-1).max()))
        total = 0
        boxes = np.asarray(s.get('gt2d_boxes', np.zeros((1, 0, 4))))
        for vi in range(boxes.shape[0]):
            total += _pixel_union(boxes[vi], v2[vi], (h, w), mcfg.stride,
                                  expand)
        unions.append(total)

    pct = lambda a: float(np.percentile(a, args.percentile)) if a else 0.0
    max_gt = _round_up(max(pct(gt3d_counts) * args.margin, 8), 8)
    max_gt2d = _round_up(max(pct(gt2d_counts) * args.margin, 8), 8)
    k_max = _round_up(
        max(pct(unions) * args.margin * args.det_inflation, 1024), 1024)
    hard_cap = mcfg.total_views * h * w
    k_max = min(k_max, _round_up(hard_cap, 1024))

    print(f'scanned {n} samples of {len(ds)} ({args.split})')
    print(f'  gt3d/scene: max {max(gt3d_counts)}  '
          f'p{args.percentile:g} {pct(gt3d_counts):.0f}')
    print(f'  gt2d/view:  max {max(gt2d_counts)}  '
          f'p{args.percentile:g} {pct(gt2d_counts):.0f}')
    print(f'  key-pixel union/scene (GT boxes): max {max(unions)}  '
          f'p{args.percentile:g} {pct(unions):.0f}  '
          f'(hard cap V*h*w = {hard_cap})')
    print('recommended (margin '
          f'{args.margin:g}, det inflation {args.det_inflation:g}):')
    print(f'  --cfg-options model.overrides.max_gt={max_gt} '
          f'model.overrides.k_max={k_max}')
    print(f'  dataset bucket: max_gt2d={max_gt2d}')
    cur = dict(max_gt=mcfg.max_gt, k_max=mcfg.k_max)
    for k, v in (('max_gt', max_gt), ('k_max', k_max)):
        if cur[k] < v:
            print(f'  WARNING: current {k}={cur[k]} < recommended {v} '
                  f'(silent truncation risk)')


if __name__ == '__main__':
    main()
