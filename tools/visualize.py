#!/usr/bin/env python
"""Prediction / GT visualization (replaces tools/visualize.py +
visual_nuscenes.py renderers): renders BEV boxes and camera projections to
PNG without the devkit.

  python tools/visualize.py <config> --checkpoint ckpt --index 0 --out vis.png
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                os.pardir)))

import numpy as np  # noqa: E402

from common import build_dataset, build_model, load_cli_config  # noqa: E402


def draw_bev(ax, boxes, color, label=None):
    from mv2d_tpu.core import boxes as B
    import jax.numpy as jnp
    if len(boxes) == 0:
        return
    bev = np.stack([boxes[:, 0], boxes[:, 1], boxes[:, 3], boxes[:, 4],
                    boxes[:, 6]], axis=-1)
    corners = np.asarray(B.bev_corners(jnp.asarray(bev)))
    for i, c in enumerate(corners):
        poly = np.concatenate([c, c[:1]], axis=0)
        ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=0.8,
                label=label if i == 0 else None)


def draw_camera_views(axes, sample, box_sets):
    """Project 3D box sets into each camera image (replaces the patched
    devkit renderer visual_nuscenes.py, incl. its GT-vs-pred overlay).
    box_sets: sequence of (boxes3d [N, 9], color)."""
    from mv2d_tpu.data.converter import _box_corners
    imgs = np.asarray(sample['imgs'])
    if imgs.shape[-1] == 12:
        # eval samples arrive pre-folded (C++ s2d path); unfold to render
        from mv2d_tpu.data.padding import s2d_unfold_images
        imgs = s2d_unfold_images(imgs)
    l2i = np.asarray(sample['lidar2img'], np.float64)
    mean = np.asarray([123.675, 116.28, 103.53])
    std = np.asarray([58.395, 57.12, 57.375])
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for v, ax in enumerate(axes):
        img = np.clip(imgs[v] * std + mean, 0, 255).astype(np.uint8)
        ax.imshow(img)
        ax.axis('off')
        H, W = img.shape[:2]
        for boxes3d, color in box_sets:
            for b in boxes3d:
                corners = _box_corners(np.asarray(b, np.float64))
                hom = np.concatenate([corners, np.ones((8, 1))], 1)
                q = hom @ l2i[v].T
                if (q[:, 2] < 0.1).all():
                    continue
                uv = q[:, :2] / np.maximum(q[:, 2:3], 0.1)
                if (uv[:, 0].max() < 0 or uv[:, 0].min() > W or
                        uv[:, 1].max() < 0 or uv[:, 1].min() > H):
                    continue
                for a, bb in edges:
                    if q[a, 2] > 0.1 and q[bb, 2] > 0.1:
                        ax.plot([uv[a, 0], uv[bb, 0]],
                                [uv[a, 1], uv[bb, 1]],
                                color=color, linewidth=0.6)
        ax.set_xlim(0, W)
        ax.set_ylim(H, 0)


def _synthetic_dataset():
    """Fixture dataset (tests/test_data._fake_nuscenes) so the GT-vs-pred
    render works without real data - used for the docs side-by-side."""
    import tempfile
    from mv2d_tpu import configs
    from mv2d_tpu.data.nuscenes import NuScenesDataset, SampleBuckets
    from mv2d_tpu.data.pipeline import IdaAugConfig
    from tests.test_data import _fake_nuscenes
    mcfg = configs.tiny()
    tmp = tempfile.mkdtemp(prefix='vis_fake_')
    info_path, coco_path = _fake_nuscenes(tmp, n_samples=2)
    final = tuple(mcfg.image_size)
    dataset = NuScenesDataset(
        info_path=info_path, ann2d_path=coco_path,
        num_frames=mcfg.num_frames, test_mode=True, final_dim=final,
        ida=IdaAugConfig(final_dim=final, H=90, W=160),
        buckets=SampleBuckets(max_gt3d=mcfg.max_gt,
                              max_gt2d=mcfg.max_gt2d))
    from mv2d_tpu.models.mv2d import MV2D
    return MV2D(mcfg), dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config', nargs='?', default=None)
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--index', type=int, default=0)
    p.add_argument('--out', default='vis.png')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--cameras', action='store_true',
                   help='also render per-camera projections')
    p.add_argument('--no-gt', action='store_true',
                   help='predictions only (GT overlay is on by default, '
                        'ref tools/visual_nuscenes.py GT-vs-pred mode)')
    p.add_argument('--synthetic', action='store_true',
                   help='render from the synthetic fixture (no config/'
                        'data needed)')
    args = p.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import jax

    from mv2d_tpu.data.nuscenes import to_eval_inputs
    from mv2d_tpu.eval.results import gt_dict_from_info
    from mv2d_tpu.train.checkpoint import restore_checkpoint

    if args.synthetic:
        jax.config.update('jax_platforms', 'cpu')
        model, dataset = _synthetic_dataset()
    else:
        cfg = load_cli_config(args.config)
        model = build_model(cfg)
        dataset = build_dataset(cfg, 'val')

    s = dataset.get_sample(args.index, np.random.default_rng(0))
    imgs, cam, shapes = to_eval_inputs(s)
    variables = model.init(jax.random.PRNGKey(0), imgs, cam, shapes)
    if args.checkpoint:
        variables = restore_checkpoint(args.checkpoint, variables)
    boxes, scores, labels, valid = jax.device_get(
        model.apply(variables, imgs, cam, shapes))
    keep = np.asarray(valid) & (np.asarray(scores) > args.score_thr)

    gt = gt_dict_from_info(dataset.get_info(args.index))
    if args.cameras:
        V = min(6, s['imgs'].shape[0])
        fig = plt.figure(figsize=(16, 9))
        ax = fig.add_subplot(2, 4, (4, 8))
        cam_axes = [fig.add_subplot(2, 4, i + 1 + (i // 3))
                    for i in range(V)]
        # GT-vs-pred overlay in the camera views (the reference's
        # patched-devkit renderer mode, tools/visual_nuscenes.py)
        sets = ([] if args.no_gt
                else [(np.asarray(gt['boxes']), 'tab:green')])
        sets.append((np.asarray(boxes)[keep], 'tab:red'))
        draw_camera_views(cam_axes, s, sets)
    else:
        fig, ax = plt.subplots(figsize=(8, 8))
    if not args.no_gt:
        draw_bev(ax, gt['boxes'], 'tab:green', 'GT')
    draw_bev(ax, np.asarray(boxes)[keep], 'tab:red', 'pred')
    ax.set_xlim(-55, 55); ax.set_ylim(-55, 55)
    ax.set_aspect('equal'); ax.legend(); ax.set_title('BEV')
    fig.savefig(args.out, dpi=130)
    print('wrote', args.out, f'({int(keep.sum())} preds, '
          f'{len(gt["boxes"])} gts)')


if __name__ == '__main__':
    main()
