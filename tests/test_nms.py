import jax
import jax.numpy as jnp
import numpy as np

from mv2d_tpu.core import nms as N


def ref_greedy_nms(boxes, scores, thr):
    """Plain numpy greedy NMS oracle."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (a + b - inter + 1e-4)
        suppressed |= iou > thr
        suppressed[i] = True  # self; already kept
    return keep


def test_nms_matches_numpy_oracle(rng):
    n = 64
    boxes = rng.uniform(0, 100, (n, 2))
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 40, (n, 2))], -1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, bool)
    _, out_scores, out_idx, out_valid = N.nms_padded(
        jnp.asarray(boxes, dtype=jnp.float32), jnp.asarray(scores),
        jnp.asarray(valid), 0.5, n)
    got = list(np.asarray(out_idx)[np.asarray(out_valid)])
    want = ref_greedy_nms(boxes, scores, 0.5)
    assert got == want


def test_nms_respects_valid_mask(rng):
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                        dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([False, True, True])
    _, _, idx, v = N.nms_padded(boxes, scores, valid, 0.5, 3)
    kept = set(np.asarray(idx)[np.asarray(v)].tolist())
    assert kept == {1, 2}


def test_multiclass_nms_shapes_and_threshold(rng):
    R, C = 20, 10
    boxes = jnp.asarray(rng.uniform(0, 200, (R, C, 2)), dtype=jnp.float32)
    boxes = jnp.concatenate([boxes, boxes + 50.0], axis=-1)
    scores = jnp.asarray(rng.uniform(0, 1, (R, C)), dtype=jnp.float32)
    valid = jnp.ones((R,), dtype=bool)
    ob, os_, ol, ov = N.multiclass_nms_2d(boxes, scores, valid,
                                          score_thr=0.5, iou_threshold=0.6,
                                          nms_pre=100, max_out=16,
                                          min_bbox_size=8)
    assert ob.shape == (16, 4) and ol.shape == (16,)
    s = np.asarray(os_)[np.asarray(ov)]
    assert (s > 0.5).all()
    # descending scores
    assert (np.diff(s) <= 1e-6).all()


def test_box3d_multiclass_nms_passthrough(rng):
    n, C = 30, 10
    boxes3d = jnp.asarray(rng.uniform(-10, 10, (n, 9)), dtype=jnp.float32)
    bev = jnp.asarray(rng.uniform(-10, 10, (n, 5)), dtype=jnp.float32)
    scores = np.zeros((n, C + 1), np.float32)
    labels = rng.integers(0, C, n)
    s = rng.uniform(0.1, 1, n)
    scores[np.arange(n), labels] = s
    out_b, out_s, out_l, out_v = N.box3d_multiclass_nms(
        boxes3d, bev, jnp.asarray(scores), jnp.ones((n,), bool),
        score_thr=0.0, max_per_scene=300, iou_threshold=1.0, num_classes=C)
    got = np.sort(np.asarray(out_s)[np.asarray(out_v)])
    np.testing.assert_allclose(got, np.sort(s), rtol=1e-5)
    # labels preserved
    lv = np.asarray(out_l)[np.asarray(out_v)]
    assert set(lv.tolist()) <= set(labels.tolist())


def test_nms_long_suppression_chain():
    """Adversarial chain A>B>C>...: greedy keeps alternating boxes; the
    fixpoint in-block solver must match exactly."""
    n = 100
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        boxes[i] = [i * 5.0, 0.0, i * 5.0 + 10.0, 10.0]  # 50% overlap chain
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    _, _, idx, v = N.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.ones(n, dtype=bool), 0.3, n)
    got = sorted(np.asarray(idx)[np.asarray(v)].tolist())
    want = sorted(ref_greedy_nms(boxes, scores, 0.3))
    assert got == want
    assert got == list(range(0, n, 2))


def test_fast_topk_exact_off_tpu():
    import numpy as np
    from mv2d_tpu.core.topk import fast_topk
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 500)),
                    jnp.float32)
    v, i = fast_topk(x, 50)
    v2, i2 = jax.lax.top_k(x, 50)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
    # k >= n passthrough
    v, i = fast_topk(x, 500)
    assert v.shape == (4, 500)


def test_topk_small_exact_matches_lax():
    import unittest.mock as um
    from mv2d_tpu.core.topk import topk_small_exact
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(90, 12, 75)), jnp.float32)
    xt = jnp.asarray(rng.integers(0, 5, (40, 33)), jnp.float32)  # many ties
    with um.patch.object(jax, 'default_backend', lambda: 'tpu'):
        v1, i1 = jax.jit(lambda a: topk_small_exact(a, 20))(x)
        v3, i3 = jax.jit(lambda a: topk_small_exact(a, 8))(xt)
    v2, i2 = jax.lax.top_k(x, 20)
    v4, i4 = jax.lax.top_k(xt, 8)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v3), np.asarray(v4))
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))
