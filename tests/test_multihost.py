"""Two-process multi-host DP smoke test.

Launches 2 local processes, each with 4 virtual CPU devices, connected via
jax.distributed (the flow tools/train.py uses with JAX_COORDINATOR).  Each
process feeds its LOCAL 4-scene slice through shard_batch
(make_array_from_process_local_data) and runs one jitted DP train step over
the 8-device global mesh.  Both processes must report the same finite loss
- the gradient all-reduce and the synced bbox normalizer ride the same
collectives as a real multi-host slice.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

WORKER = r"""
import os, sys
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=4')
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address=sys.argv[2],
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2 and jax.device_count() == 8
assert jax.local_device_count() == 4

import jax.numpy as jnp
import numpy as np
REPO = __REPO__
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))
from mv2d_tpu import configs
from mv2d_tpu.core.geometry import prepare_camera_params
from mv2d_tpu.models.mv2d import MV2D, GroundTruth2D, GroundTruth3D
from mv2d_tpu.parallel.mesh import make_dp_train_step, make_mesh, shard_batch
from mv2d_tpu.train.optim import make_optimizer
from mv2d_tpu.train.train_step import TrainBatch, init_train_state
from test_model import make_rig

cfg = configs.tiny(key_mode='pixel', num_frames=1)
V = cfg.total_views
K, E = make_rig(V)
cam = prepare_camera_params(K, E)
rng = np.random.default_rng(0)   # same seed everywhere for the weights

def scene(n_gt, seed):
    r = np.random.default_rng(seed)
    imgs = jnp.asarray(r.normal(size=(V, *cfg.image_size, 3)) * 0.1,
                       jnp.float32)
    shapes = jnp.asarray([[*cfg.image_size]] * V)
    g2b = np.zeros((V, 4, 4), np.float32); g2v = np.zeros((V, 4), bool)
    g2b[:, 0] = [20, 16, 60, 48]; g2v[:, 0] = True
    gt2d = GroundTruth2D(jnp.asarray(g2b), jnp.zeros((V, 4), jnp.int32),
                         jnp.asarray(g2v))
    G = cfg.max_gt
    g3b = np.zeros((G, 9), np.float32)
    for i in range(n_gt):
        g3b[i] = [10 + 5 * i, 2 * i, -1, 2, 4, 1.5, 0.3, 0, 0]
    gt3d = GroundTruth3D(jnp.asarray(g3b), jnp.zeros((G,), jnp.int32),
                         jnp.asarray(np.arange(G) < n_gt))
    return TrainBatch(imgs=imgs, cam=cam, img_shapes=shapes,
                      gt2d=gt2d, gt3d=gt3d)

# global batch of 8 scenes; THIS process materializes only its 4
local_scenes = [scene((i % 3) + 1, seed=i) for i in range(pid * 4,
                                                          pid * 4 + 4)]
local = jax.tree.map(lambda *xs: jnp.stack(xs), *local_scenes)

model = MV2D(cfg)
s0 = local_scenes[0]
variables = model.init({'params': jax.random.PRNGKey(0),
                        'aug': jax.random.PRNGKey(1),
                        'dn': jax.random.PRNGKey(2),
                        'dropout': jax.random.PRNGKey(3)},
                       s0.imgs, s0.cam, s0.img_shapes, s0.gt2d, s0.gt3d,
                       method=MV2D.forward_train)
tx = make_optimizer(variables['params'], base_lr=1e-3, total_steps=10,
                    clip_norm=35.0)
mesh = make_mesh()
state = init_train_state(model, variables, tx)
step = make_dp_train_step(model, tx, mesh)
batch = shard_batch(mesh, local)
state, metrics = step(state, batch, jax.random.PRNGKey(7))
total = float(sum(float(v) for k, v in metrics.items()
                  if k.endswith('loss_cls') or k.endswith('loss_bbox')))
import math
assert math.isfinite(total), metrics
print(f'MHOST_OK pid={pid} loss={total:.6f}', flush=True)
"""


@pytest.mark.slow
def test_two_process_dp_step(tmp_path):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    coord = f'localhost:{port}'
    script = tmp_path / 'worker.py'
    script.write_text(WORKER.replace('__REPO__', repr(REPO)))
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_PLATFORMS', None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'pid {pid}:\n{out[-4000:]}'
        assert 'MHOST_OK' in out, out[-2000:]
    losses = [float(o.split('loss=')[1].split()[0]) for o in outs]
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
