#!/usr/bin/env python
"""Summarize an xplane/trace.json.gz device profile by HLO category and
source line (tools/train_bench.py --trace DIR writes one).

  python tools/trace_summary.py /tmp/train_trace2 [--steps 3] [--top 30]
"""
import argparse
import collections
import glob
import gzip
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument('trace_dir')
    p.add_argument('--steps', type=int, default=3,
                   help='number of traced steps (durations are divided)')
    p.add_argument('--top', type=int, default=30)
    args = p.parse_args()

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, 'plugins/profile/*/*.trace.json.gz')))
    if not paths:
        raise SystemExit(f'no trace.json.gz under {args.trace_dir}')
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr['traceEvents']

    dev_pids = {e['pid'] for e in ev
                if e.get('ph') == 'M' and e.get('name') == 'process_name'
                and 'TPU' in str(e.get('args', {}).get('name', ''))}

    by_cat = collections.Counter()
    by_src = collections.Counter()
    by_name = collections.Counter()
    name_info = {}
    for e in ev:
        if e.get('ph') != 'X' or e.get('pid') not in dev_pids:
            continue
        a = e.get('args', {})
        cat = a.get('hlo_category')
        if cat is None:
            continue                       # host rows / trace scaffolding
        dur = e['dur']
        by_cat[cat] += dur
        src = a.get('source', '?')
        by_src[(src, cat)] += dur
        nm = e.get('name', '?')
        by_name[nm] += dur
        if nm not in name_info:
            name_info[nm] = (src, cat, a.get('tf_op', '')[:90])

    tot = sum(by_cat.values())
    n = args.steps
    print(f'device total: {tot / 1000 / n:.2f} ms/step\n')
    print('== by category ==')
    for c, d in by_cat.most_common():
        print(f'  {d / 1000 / n:8.2f} ms  {100 * d / tot:5.1f}%  {c}')
    print('\n== by (source, category) ==')
    for (s, c), d in by_src.most_common(args.top):
        print(f'  {d / 1000 / n:8.2f} ms  {c:<22} {s}')
    print('\n== top ops ==')
    for nm, d in by_name.most_common(args.top):
        src, cat, tf = name_info[nm]
        print(f'  {d / 1000 / n:8.2f} ms  {nm:<28} {cat:<18} {src}')
        if tf:
            print(f'              {tf}')


if __name__ == '__main__':
    main()
