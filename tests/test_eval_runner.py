"""Eval runner on the 8-device CPU mesh (data-parallel group eval)."""
import jax
import numpy as np
import pytest

from mv2d_tpu import configs
from mv2d_tpu.data import nuscenes as nusc
from mv2d_tpu.data import pipeline as pl
from mv2d_tpu.eval.runner import run_eval
from mv2d_tpu.models.mv2d import MV2D
from tests.test_data import _fake_nuscenes


def test_run_eval_data_parallel(tmp_path, rng):
    info_path, coco_path = _fake_nuscenes(str(tmp_path), n_samples=3)
    ds = nusc.NuScenesDataset(
        info_path=info_path, ann2d_path=coco_path, num_frames=1,
        final_dim=(64, 96),
        ida=pl.IdaAugConfig(final_dim=(64, 96), H=90, W=160),
        test_mode=True)
    cfg = configs.tiny(num_views=6)
    model = MV2D(cfg)
    from mv2d_tpu.data.nuscenes import to_eval_inputs
    imgs, cam, shapes = to_eval_inputs(ds.get_sample(0))
    variables = model.init(jax.random.PRNGKey(0), imgs, cam, shapes)

    m_dp, sub = run_eval(model, variables, ds, verbose=False,
                         collect_submission=True, data_parallel=True)
    assert 'mAP' in m_dp and 'NDS' in m_dp
    assert len(sub['results']) == 3
    # single-device path must produce identical metrics
    m_sd, _ = run_eval(model, variables, ds, verbose=False,
                       data_parallel=False)
    np.testing.assert_allclose(m_dp['mAP'], m_sd['mAP'], atol=1e-6)
    np.testing.assert_allclose(m_dp['NDS'], m_sd['NDS'], atol=1e-6)
