#!/usr/bin/env python
"""Size the model's static shape buckets from dataset statistics.

Report mode for mv2d_tpu/data/calibration.py (the scan/recommend logic
lives there; `tools/train.py --auto-buckets N` applies the same
recommendation automatically).  Prints per-sample stats and the
`--cfg-options model.overrides.*` line to copy into a run.

  python tools/calibrate_buckets.py <config> [--samples 200]
      [--percentile 100] [--margin 1.25] [--det-inflation 2.0]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

from common import build_dataset, build_model_config, load_cli_config  # noqa: E402
from mv2d_tpu.data.calibration import calibrate  # noqa: E402


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
    rec, stats = calibrate(ds, mcfg, samples=args.samples,
                           percentile=args.percentile, margin=args.margin,
                           det_inflation=args.det_inflation)

    import numpy as np
    pct = lambda a: float(np.percentile(a, args.percentile)) if a else 0.0
    h, w = stats['feat_hw']
    hard_cap = mcfg.total_views * h * w
    print(f'scanned {stats["n"]} samples of {stats["total"]} ({args.split})')
    print(f'  gt3d/scene: max {max(stats["gt3d_counts"])}  '
          f'p{args.percentile:g} {pct(stats["gt3d_counts"]):.0f}')
    print(f'  gt2d/view:  max {max(stats["gt2d_counts"])}  '
          f'p{args.percentile:g} {pct(stats["gt2d_counts"]):.0f}')
    print(f'  key-pixel union/scene (GT boxes): max {max(stats["unions"])}  '
          f'p{args.percentile:g} {pct(stats["unions"]):.0f}  '
          f'(hard cap V*h*w = {hard_cap})')
    print('recommended (margin '
          f'{args.margin:g}, det inflation {args.det_inflation:g}):')
    print(f'  --cfg-options model.overrides.max_gt={rec["max_gt"]} '
          f'model.overrides.k_max={rec["k_max"]}')
    print(f'  dataset bucket: max_gt2d={rec["max_gt2d"]}')
    cur = dict(max_gt=mcfg.max_gt, k_max=mcfg.k_max)
    for k in ('max_gt', 'k_max'):
        if cur[k] < rec[k]:
            print(f'  WARNING: current {k}={cur[k]} < recommended {rec[k]} '
                  f'(silent truncation risk; tools/train.py --auto-buckets '
                  f'applies this automatically)')


if __name__ == '__main__':
    main()
