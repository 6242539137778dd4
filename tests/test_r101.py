"""Coverage for the R101 / 1600x640 stretch recipe (VERDICT r2 weak #4).

The reference's R101 detector base (configs/mv2d/detectors/
maskrcnn_r101.py) at 1600x640 with the two-frame head.  The full-size
recipe only runs on real hardware (bench.py --config r101); these tests
pin (a) the preset's bucket calibration for the higher resolution and
(b) that the R101 backbone actually constructs and trains end to end.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mv2d_tpu import configs
from mv2d_tpu.core.geometry import prepare_camera_params
from mv2d_tpu.models.mv2d import MV2D, GroundTruth2D, GroundTruth3D
from mv2d_tpu.train.optim import make_optimizer
from mv2d_tpu.train.train_step import (TrainBatch, init_train_state,
                                       make_train_step)


def test_r101_preset_bucket_calibration():
    cfg = configs.mv2d_t_r101()
    assert cfg.depth == 101
    assert cfg.image_size == (640, 1600)
    # k_max must cover the stretch resolution's key budget: the R50 recipe
    # uses 16384 of 12*32*88 = 33792 stride-16 pixels (48.5%); 1600x640 has
    # 12*40*100 = 48000, so the same coverage needs >= 23273 - and the
    # correlated-pixel count scales with image area, not with the 1408x512
    # calibration (VERDICT r2: 16384 would overflow here)
    total_pixels = 12 * (640 // 16) * (1600 // 16)
    assert cfg.k_max >= int(0.485 * total_pixels)
    assert cfg.k_max % 128 == 0        # flash-attention key-block multiple


def test_r101_config_file_resolves():
    from mv2d_tpu.utils.config import load_config
    cfg = load_config('configs/mv2d/mv2d_r101_frcnn_two_frames_1600x640'
                      '_ep24.py')
    assert cfg['model']['preset'] == 'mv2d_t_r101'
    assert tuple(cfg['data']['val']['final_dim']) == (640, 1600)
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tools'))
    from common import build_model_config
    mcfg = build_model_config(cfg)
    assert mcfg.depth == 101 and mcfg.k_max == 24576


def _rig(n, size):
    Ks, Es = [], []
    for i in range(n):
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 0.9 * size[1]
        K[0, 2], K[1, 2] = size[1] / 2, size[0] / 2
        ang = 2 * np.pi * (i % 2) / 2
        Rz = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                         [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        R = np.asarray([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64) @ Rz
        E = np.eye(4)
        E[:3, :3] = R
        Ks.append(K)
        Es.append(E.T)
    return np.stack(Ks), np.stack(Es)


def test_r101_two_frame_train_step(rng):
    """mv2d_t_r101 at reduced shapes: the 101-layer backbone (stage depths
    3-4-23-3, DCN stages 3-4), two-frame head and optimizer param groups
    all construct, and one train step yields a finite loss."""
    cfg = configs.mv2d_t_r101(
        num_views=2, image_size=(64, 96), embed_dims=32, fpn_channels=32,
        rcnn_fc_channels=64, depth_num=8, num_decoder_layers=2, num_heads=4,
        feedforward_channels=64, k_max=64, max_gt=4, denoise_scalar=3,
        proposal_train=configs.DetectionProposalCfg(
            score_thr=0.05, nms_pre=32, max_per_img=6, min_bbox_size=0.0,
            rpn_nms_pre=64, rpn_max_per_img=32),
        proposal_test=configs.DetectionProposalCfg(
            score_thr=0.05, nms_pre=32, max_per_img=6, min_bbox_size=0.0,
            rpn_nms_pre=64, rpn_max_per_img=32),
        max_num=20, max_per_scene=20)
    assert cfg.depth == 101 and cfg.num_frames == 2
    V = cfg.total_views
    K, E = _rig(V, cfg.image_size)
    cam = prepare_camera_params(K, E, timestamps=[0.0] * 2 + [0.5] * 2)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)) * 0.1,
                       dtype=jnp.float32)
    img_shapes = jnp.asarray([[*cfg.image_size]] * V)
    G2 = 4
    g2b = np.zeros((V, G2, 4), np.float32)
    g2b[:, 0] = [20, 16, 60, 48]
    g2v = np.zeros((V, G2), bool)
    g2v[:, 0] = True
    gt2d = GroundTruth2D(boxes=jnp.asarray(g2b),
                         labels=jnp.zeros((V, G2), jnp.int32),
                         valid=jnp.asarray(g2v))
    G = cfg.max_gt
    g3b = np.zeros((G, 9), np.float32)
    g3b[0] = [10, 0, -1, 2, 4, 1.5, 0.3, 0, 0]
    gt3d = GroundTruth3D(boxes=jnp.asarray(g3b),
                         labels=jnp.zeros((G,), jnp.int32),
                         valid=jnp.asarray(np.arange(G) < 1))
    batch = TrainBatch(imgs=imgs, cam=cam, img_shapes=img_shapes,
                       gt2d=gt2d, gt3d=gt3d)

    model = MV2D(cfg)
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'aug': jax.random.PRNGKey(1),
         'dn': jax.random.PRNGKey(2), 'dropout': jax.random.PRNGKey(3)},
        imgs, cam, img_shapes, gt2d, gt3d, method=MV2D.forward_train)
    # R101 = stage depths (3, 4, 23, 3)
    bb = variables['params']['base_detector']['backbone']
    n_l3 = len([k for k in bb if k.startswith('layer3_')])
    assert n_l3 == 23, n_l3
    tx = make_optimizer(variables['params'], base_lr=2e-4, total_steps=10)
    state = init_train_state(model, variables, tx)
    step = make_train_step(model, tx)
    state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics['total_loss']))
    assert int(state.step) == 1
