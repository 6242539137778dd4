import jax.numpy as jnp
import numpy as np

from mv2d_tpu.ops.pallas_nms import pallas_greedy_nms
from tests.test_nms import ref_greedy_nms


def test_pallas_nms_matches_oracle(rng):
    n = 150
    boxes = rng.uniform(0, 100, (n, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 40, (n, 2))],
                           -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order = np.argsort(-scores)
    sorted_boxes = boxes[order]
    keep = pallas_greedy_nms(jnp.asarray(sorted_boxes),
                             jnp.ones(n, dtype=bool), 0.5, interpret=True)
    got = order[np.asarray(keep)]
    want = ref_greedy_nms(boxes, scores, 0.5)
    assert sorted(got.tolist()) == sorted(want)


def test_pallas_nms_invalid_tail(rng):
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                        dtype=jnp.float32)
    valid = jnp.asarray([True, True, False])
    keep = pallas_greedy_nms(boxes, valid, 0.5, interpret=True)
    assert np.asarray(keep).tolist() == [True, False, False]
