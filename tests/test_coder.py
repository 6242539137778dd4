import jax.numpy as jnp
import numpy as np

from mv2d_tpu.core import boxes as B
from mv2d_tpu.core.coder import nms_free_decode


def test_nms_free_decode_topk(rng):
    Q, C, K = 40, 10, 12
    logits = rng.normal(-4, 1, (Q, C)).astype(np.float32)
    # plant three confident detections
    logits[3, 2] = 4.0
    logits[10, 7] = 3.0
    logits[20, 0] = 2.0
    raw = np.stack([
        rng.uniform(-40, 40, Q), rng.uniform(-40, 40, Q),
        rng.uniform(-3, 1, Q),
        rng.uniform(0.5, 4, Q), rng.uniform(0.5, 4, Q), rng.uniform(0.5, 3, Q),
        rng.uniform(-np.pi, np.pi, Q),
        rng.uniform(-5, 5, Q), rng.uniform(-5, 5, Q)], -1).astype(np.float32)
    code = B.normalize_bbox(jnp.asarray(raw))
    valid = np.ones(Q, bool)
    boxes, scores, labels, ok = nms_free_decode(
        jnp.asarray(logits), code, jnp.asarray(valid), max_num=K,
        num_classes=C, post_center_range=[-61.2, -61.2, -10, 61.2, 61.2, 10])
    boxes, scores, labels, ok = map(np.asarray, (boxes, scores, labels, ok))
    assert boxes.shape == (K, 9)
    assert ok[:3].all()
    np.testing.assert_allclose(boxes[0], raw[3], rtol=1e-3, atol=1e-3)
    assert labels[0] == 2 and labels[1] == 7 and labels[2] == 0
    assert (np.diff(scores[ok]) <= 1e-6).all()


def test_nms_free_decode_masks_invalid_queries(rng):
    Q, C = 8, 10
    logits = np.full((Q, C), -2.0, np.float32)
    logits[0, 1] = 5.0   # invalid query, must not surface
    logits[4, 3] = 1.0
    code = jnp.zeros((Q, 10))
    valid = np.ones(Q, bool)
    valid[0] = False
    _, _, labels, ok = nms_free_decode(
        jnp.asarray(logits), code, jnp.asarray(valid), max_num=4,
        num_classes=C, post_center_range=[-61.2, -61.2, -10, 61.2, 61.2, 10])
    labels, ok = np.asarray(labels), np.asarray(ok)
    assert labels[0] == 3 and ok[0]


def test_post_center_range_filter(rng):
    Q, C = 4, 10
    logits = np.full((Q, C), -1.0, np.float32)
    logits[0, 0] = 5.0
    raw = np.zeros((Q, 9), np.float32)
    raw[:, 3:6] = 1.0
    raw[0, 0] = 100.0  # out of post range
    code = B.normalize_bbox(jnp.asarray(raw))
    _, _, _, ok = nms_free_decode(
        jnp.asarray(logits), code, jnp.ones(Q, dtype=bool), max_num=4,
        num_classes=C, post_center_range=[-61.2, -61.2, -10, 61.2, 61.2, 10])
    assert not np.asarray(ok)[0]
