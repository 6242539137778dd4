"""Shared CLI plumbing: config -> model/dataset construction."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

# the container sitecustomize may override jax_platforms; honor the env var
if os.environ.get('JAX_PLATFORMS'):
    import jax as _jax
    _jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import numpy as np  # noqa: E402

from mv2d_tpu import configs as presets  # noqa: E402
from mv2d_tpu.data.nuscenes import NuScenesDataset  # noqa: E402
from mv2d_tpu.data.pipeline import IdaAugConfig  # noqa: E402
from mv2d_tpu.models.mv2d import MV2D  # noqa: E402
from mv2d_tpu.utils.config import apply_overrides, load_config  # noqa: E402


def build_model_config(cfg: dict):
    m = cfg['model']
    preset_fn = getattr(presets, m['preset'])
    overrides = dict(m.get('overrides', {}))
    return preset_fn(**overrides)


def build_model(cfg: dict) -> MV2D:
    return MV2D(build_model_config(cfg))


def build_dataset(cfg: dict, split: str) -> NuScenesDataset:
    from mv2d_tpu.data.nuscenes import SampleBuckets
    d = dict(cfg['data'][split])
    final_dim = tuple(d.get('final_dim', (512, 1408)))
    ida = IdaAugConfig(final_dim=final_dim)
    mcfg = build_model_config(cfg)
    # GT buckets must match the model's static shapes (DN group width;
    # max_gt2d sizes the GT-complement proposal slots)
    buckets = SampleBuckets(max_gt3d=mcfg.max_gt, max_gt2d=mcfg.max_gt2d)
    return NuScenesDataset(
        info_path=d['info_path'], ann2d_path=d.get('ann2d_path'),
        data_root=d.get('data_root', ''),
        num_frames=d.get('num_frames', 1),
        sweep_range=tuple(d.get('sweep_range', (3, 27))),
        test_mode=d.get('test_mode', split != 'train'),
        final_dim=final_dim, ida=ida, buckets=buckets)


def load_cli_config(path: str, cfg_options=None) -> dict:
    cfg = load_config(path)
    if cfg_options:
        cfg = apply_overrides(cfg, cfg_options)
    return cfg
