"""Optimizer: AdamW + param-wise LR rules + cosine schedule + grad clip.

Mirrors the reference recipe (ref: configs/mv2d/exp/..._ep24.py:168-192):
  * AdamW lr 2e-4, weight_decay 0.01,
  * backbone lr_mult 0.25 (paramwise_cfg custom_keys),
  * frozen stage-1 + frozen BN affines (backbone frozen_stages=1,
    norm requires_grad=False, maskrcnn_r50.py:10-12) -> zero updates,
  * grad clip max_norm 35 (Fp16OptimizerHook grad_clip),
  * CosineAnnealing to 1e-3 * lr with 500-iter linear warmup from lr/3.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def cosine_schedule(base_lr: float, total_steps: int,
                    warmup_iters: int = 500, warmup_ratio: float = 1.0 / 3,
                    min_lr_ratio: float = 1e-3) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio) *
                          jnp.minimum(step, warmup_iters) / warmup_iters)
        t = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        cos = base_lr * (min_lr_ratio + (1 - min_lr_ratio) *
                         0.5 * (1 + jnp.cos(jnp.pi * t)))
        return jnp.where(step < warmup_iters, jnp.minimum(warm, cos), cos)
    return schedule


def _label_params(params: Any) -> Any:
    """'frozen' | 'backbone' | 'default' per param leaf."""
    def label_of_path(path) -> str:
        keys = [getattr(k, 'key', str(k)) for k in path]
        joined = '/'.join(str(k) for k in keys)
        if 'backbone' in joined:
            if ('stem' in joined or 'layer1_' in joined or
                    '/bn' in joined or 'downsample_bn' in joined):
                return 'frozen'
            return 'backbone'
        return 'default'

    return jax.tree_util.tree_map_with_path(
        lambda p, _: label_of_path(p), params)


def make_optimizer(params: Any, base_lr: float = 2e-4,
                   total_steps: int = 100000, weight_decay: float = 0.01,
                   backbone_lr_mult: float = 0.25,
                   clip_norm: float = 35.0) -> optax.GradientTransformation:
    sched = cosine_schedule(base_lr, total_steps)
    sched_bb = cosine_schedule(base_lr * backbone_lr_mult, total_steps)

    def adamw(schedule):
        return optax.adamw(schedule, b1=0.9, b2=0.999,
                           weight_decay=weight_decay)

    tx = optax.multi_transform(
        {'default': adamw(sched), 'backbone': adamw(sched_bb),
         'frozen': optax.set_to_zero()},
        _label_params(params))
    return optax.chain(optax.clip_by_global_norm(clip_norm), tx)
