"""Overfit-one-scene smoke: the full training loop must learn."""
import jax
import jax.numpy as jnp
import numpy as np

from mv2d_tpu import configs
from mv2d_tpu.core.geometry import prepare_camera_params
from mv2d_tpu.models.mv2d import MV2D, GroundTruth2D, GroundTruth3D
from mv2d_tpu.train.optim import make_optimizer
from mv2d_tpu.train.train_step import (TrainBatch, init_train_state,
                                       make_train_step)
from tests.test_model import make_rig


def test_overfit_single_scene(rng):
    cfg = configs.tiny(key_mode='pixel', num_frames=1)
    V = cfg.total_views
    K, E = make_rig(V)
    cam = prepare_camera_params(K, E)
    imgs = jnp.asarray(rng.normal(size=(V, *cfg.image_size, 3)) * 0.2,
                       dtype=jnp.float32)
    img_shapes = jnp.asarray([[*cfg.image_size]] * V)
    G2 = 4
    g2b = np.zeros((V, G2, 4), np.float32)
    g2v = np.zeros((V, G2), bool)
    g2b[:, 0] = [24, 16, 64, 48]
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
    tx = make_optimizer(variables['params'], base_lr=5e-4, total_steps=100,
                        clip_norm=35.0)
    state = init_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, tx))
    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics['total_loss']))
    assert np.isfinite(losses).all()
    # overfitting one scene must reduce the loss substantially
    early = np.mean(losses[:3])
    late = np.mean(losses[-3:])
    assert late < early * 0.8, (early, late, losses)
