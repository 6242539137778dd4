#!/usr/bin/env python
"""Training CLI (config-driven, mirrors the reference tools/train.py flow).

Usage:
  python tools/train.py configs/mv2d/mv2d_r50_frcnn_two_frames_1408x512_ep24.py \
      --work-dir work_dirs/mv2dt [--resume-from ckpt] [--cfg-options k=v ...]

Multi-host: set JAX_COORDINATOR=host:port (+ JAX_NUM_PROCESSES /
JAX_PROCESS_ID) and launch one process per host; the DP mesh spans all
devices (replaces torch.distributed.launch, ref tools/dist_train.sh).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from common import (build_dataset, build_model, build_model_config,
                    load_cli_config)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--work-dir', default='work_dirs/default')
    p.add_argument('--resume-from', default=None)
    p.add_argument('--auto-resume', action='store_true',
                   help='resume from the latest epoch_* ckpt in --work-dir')
    p.add_argument('--load-from', default=None,
                   help='torch .pth or orbax params to initialize from')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--max-steps', type=int, default=None,
                   help='cap steps (debug)')
    p.add_argument('--auto-buckets', type=int, default=None, metavar='N',
                   help='scan N train samples and auto-raise the static '
                        'shape buckets (max_gt, k_max) before building '
                        'the model (see mv2d_tpu/data/calibration.py)')
    p.add_argument('--cfg-options', nargs='*', default=None)
    return p.parse_args()


def main():
    args = parse_args()
    if os.environ.get('JAX_COORDINATOR'):
        import jax
        jax.distributed.initialize(
            coordinator_address=os.environ['JAX_COORDINATOR'],
            num_processes=int(os.environ.get('JAX_NUM_PROCESSES', '1')),
            process_id=int(os.environ.get('JAX_PROCESS_ID', '0')))
    import jax
    import jax.numpy as jnp

    cfg = load_cli_config(args.config, args.cfg_options)
    os.makedirs(args.work_dir, exist_ok=True)
    with open(os.path.join(args.work_dir, 'config.json'), 'w') as f:
        json.dump({k: str(v) for k, v in cfg.items()}, f, indent=2)

    from mv2d_tpu.data.nuscenes import Prefetcher, to_train_batch
    from mv2d_tpu.models.mv2d import MV2D
    from mv2d_tpu.parallel.mesh import make_dp_train_step, make_mesh, \
        shard_batch
    from mv2d_tpu.train.checkpoint import (convert_torch_state_dict,
                                           restore_checkpoint,
                                           save_checkpoint)
    from mv2d_tpu.train.optim import make_optimizer
    from mv2d_tpu.train.train_step import init_train_state

    if args.auto_buckets:
        from mv2d_tpu.data.calibration import apply_to_config, calibrate
        mcfg0 = build_model_config(cfg)
        # scan with a throwaway dataset: the real one is built AFTER the
        # overrides land (build_dataset sizes its GT pad buckets from the
        # model config, and model/dataset buckets must agree)
        rec, stats = calibrate(build_dataset(cfg, 'train'), mcfg0,
                               samples=args.auto_buckets)
        applied = apply_to_config(cfg, rec, mcfg0) or \
            'nothing (current buckets already cover the data)'
        print(f'auto-buckets: scanned {stats["n"]} samples, '
              f'recommended {rec}, applied {applied}')
    model = build_model(cfg)
    mcfg = model.cfg
    dataset = build_dataset(cfg, 'train')
    # each process buffers scenes for ITS devices; shard_batch assembles
    # the global array across processes (multi-host DP)
    n_dev = jax.local_device_count()
    g_dev = jax.device_count()
    epochs = cfg.get('total_epochs', 24)
    steps_per_epoch = max(1, len(dataset) // g_dev)
    total_steps = steps_per_epoch * epochs

    # ---- init params on one example
    rng = np.random.default_rng(args.seed)
    sample = dataset.get_sample(0, rng)
    b0 = to_train_batch(sample)
    # jit the init: on the remote-TPU (axon) backend eager per-op dispatch
    # costs seconds per op - an un-jitted full-model init never finishes
    init_fn = jax.jit(lambda r, *a: model.init(
        r, *a, method=MV2D.forward_train))
    variables = init_fn(
        {'params': jax.random.PRNGKey(args.seed),
         'aug': jax.random.PRNGKey(1), 'dn': jax.random.PRNGKey(2),
         'dropout': jax.random.PRNGKey(3)},
        b0.imgs, b0.cam, b0.img_shapes, b0.gt2d, b0.gt3d)

    if args.load_from:
        if args.load_from.endswith('.pth'):
            import torch
            sd = torch.load(args.load_from, map_location='cpu')
            sd = sd.get('state_dict', sd)
            sd = {k: v.numpy() for k, v in sd.items()}
            params, constants = convert_torch_state_dict(sd)
            print(f'loaded torch ckpt, unmatched={params.pop("_unmatched")}')
            params.pop('_unmatched_keys', None)
            variables = dict(params=_merge_trees(variables['params'], params),
                             constants=_merge_trees(
                                 variables.get('constants', {}), constants))

    opt_cfg = cfg.get('optimizer', {})
    tx = make_optimizer(variables['params'],
                        base_lr=opt_cfg.get('lr', 2e-4),
                        total_steps=total_steps,
                        weight_decay=opt_cfg.get('weight_decay', 0.01),
                        backbone_lr_mult=opt_cfg.get('backbone_lr_mult', 0.25),
                        clip_norm=opt_cfg.get('clip_norm', 35.0))
    state = init_train_state(model, variables, tx)
    start_epoch = 0
    resume_from = args.resume_from
    if resume_from is None and args.auto_resume:
        # reference --auto-resume (tools/train.py:37-42): pick the latest
        # epoch checkpoint in the work dir, if any
        import re
        cands = []
        if os.path.isdir(args.work_dir):
            for d in os.listdir(args.work_dir):
                m = re.fullmatch(r'epoch_(\d+)', d)
                if m:
                    cands.append((int(m.group(1)),
                                  os.path.join(args.work_dir, d)))
        if cands:
            resume_from = max(cands)[1]
    if resume_from:
        state = restore_checkpoint(resume_from, state)
        start_epoch = int(state.step) // steps_per_epoch
        print(f'resumed from {resume_from} at step {int(state.step)}')

    mesh = make_mesh()
    step_fn = make_dp_train_step(model, tx, mesh)
    log_interval = cfg.get('log_interval', 50)
    log_path = os.path.join(args.work_dir, 'train_log.jsonl')

    key = jax.random.PRNGKey(args.seed + 100)
    global_step = int(state.step)
    for epoch in range(start_epoch, epochs):
        order = rng.permutation(len(dataset))
        # multi-host: disjoint per-process slice of the shared permutation
        # (the reference's DistributedGroupSampler rank split)
        order = order[jax.process_index()::jax.process_count()]
        pf = Prefetcher(dataset, order.tolist(), seed=args.seed + epoch)
        buf = []
        t0 = time.time()
        for _, s in pf:
            buf.append(to_train_batch(s))
            if len(buf) < n_dev:
                continue
            batch = jax.tree.map(lambda *xs: jnp.stack(xs), *buf)
            buf = []
            batch = shard_batch(mesh, batch)
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, batch, sub)
            global_step += 1
            if global_step % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(step=global_step, epoch=epoch,
                         sps=g_dev * log_interval / (time.time() - t0))
                t0 = time.time()
                print(json.dumps(m))
                with open(log_path, 'a') as f:
                    f.write(json.dumps(m) + '\n')
            if args.max_steps and global_step >= args.max_steps:
                break
        pf.close()
        if jax.process_index() == 0:
            save_checkpoint(os.path.join(args.work_dir, f'epoch_{epoch + 1}'),
                            jax.device_get(state))
        # eval hook (ref: evaluation.interval, exp config :195)
        eval_interval = cfg.get('evaluation', {}).get('interval', 0)
        if (eval_interval and (epoch + 1) % eval_interval == 0
                and 'val' in cfg.get('data', {})
                and jax.process_index() == 0):
            from mv2d_tpu.eval.runner import run_eval
            val_ds = build_dataset(cfg, 'val')
            variables_eval = {'params': state.params,
                              'constants': state.constants}
            metrics, _ = run_eval(model, variables_eval, val_ds,
                                  max_samples=cfg.get('evaluation', {}).get(
                                      'max_samples'))
            line = {f'val_{k}': round(float(v), 4)
                    for k, v in metrics.items()
                    if k in ('mAP', 'NDS') or k.startswith('m')}
            line['epoch'] = epoch + 1
            print(json.dumps(line))
            with open(log_path, 'a') as f:
                f.write(json.dumps(line) + '\n')
        if args.max_steps and global_step >= args.max_steps:
            break
    print('training done, step', global_step)


def _merge_trees(dst, src):
    """Overlay src leaves onto dst (shape-checked)."""
    import jax
    out = dict(dst) if isinstance(dst, dict) else dst
    for k, v in (src.items() if isinstance(src, dict) else []):
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_trees(out[k], v)
        elif k in out:
            assert np.shape(out[k]) == np.shape(v), \
                f'shape mismatch at {k}: {np.shape(out[k])} vs {np.shape(v)}'
            out[k] = v
        else:
            out[k] = v
    return out


if __name__ == '__main__':
    main()
