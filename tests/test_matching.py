import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from mv2d_tpu.core import matching as M


def test_native_lap_matches_scipy(rng):
    for q, g in [(10, 4), (50, 50), (7, 12), (300, 40)]:
        cost = rng.uniform(0, 10, (q, g))
        out = M.lsa_host(cost)
        rows, cols = linear_sum_assignment(cost)
        want = np.full(q, -1, np.int32)
        want[rows] = cols
        # total cost must match even if ties permute assignment
        got_cost = sum(cost[i, out[i]] for i in range(q) if out[i] >= 0)
        want_cost = cost[rows, cols].sum()
        np.testing.assert_allclose(got_cost, want_cost, rtol=1e-9)
        assert (out >= 0).sum() == min(q, g)
        # no duplicate columns
        used = out[out >= 0]
        assert len(set(used.tolist())) == len(used)


def test_native_lib_loaded():
    assert M._load_native(), "C++ LAP library should build & load in-repo"


def test_hungarian_assign_padded(rng):
    Q, G = 16, 8
    cost = rng.uniform(0, 5, (Q, G)).astype(np.float32)
    query_valid = np.ones(Q, bool)
    query_valid[12:] = False
    gt_valid = np.ones(G, bool)
    gt_valid[5:] = False
    assigned, pos = jax.jit(M.hungarian_assign)(
        jnp.asarray(cost), jnp.asarray(query_valid), jnp.asarray(gt_valid))
    assigned, pos = np.asarray(assigned), np.asarray(pos)
    assert pos.sum() == 5          # every valid gt matched once
    assert set(assigned[pos].tolist()) == {0, 1, 2, 3, 4}
    assert not pos[12:].any()      # invalid queries never matched
    # optimality on the valid submatrix
    rows, cols = linear_sum_assignment(cost[:12, :5])
    want = cost[rows, cols].sum()
    got = sum(cost[i, assigned[i]] for i in range(Q) if pos[i])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_focal_cost_prefers_confident_right_class():
    logits = jnp.asarray([[5.0, -5.0], [-5.0, 5.0]])
    labels = jnp.asarray([0, 1])
    cost = np.asarray(M.focal_loss_cost(logits, labels))
    assert cost[0, 0] < cost[1, 0]
    assert cost[1, 1] < cost[0, 1]


def test_bbox_l1_cost():
    pred = jnp.zeros((2, 10))
    gt = jnp.ones((3, 10))
    cost = np.asarray(M.bbox3d_l1_cost(pred, gt, weight=0.25))
    np.testing.assert_allclose(cost, 0.25 * 8.0)


def test_jv_on_device_matches_scipy(rng):
    """On-device JV must be EXACTLY optimal (same algorithm as scipy)."""
    for q, g in [(40, 8), (300, 40), (100, 100), (64, 64)]:
        cost = rng.uniform(0, 5, (q, g)).astype(np.float32)
        qv = np.ones(q, bool)
        gv = np.ones(g, bool)
        owner = np.asarray(M.jv_assign(jnp.asarray(cost), jnp.asarray(gv),
                                       jnp.asarray(qv)))
        matched = owner >= 0
        assert matched.sum() == g
        assert len(set(owner[matched])) == g          # one-to-one
        got = cost[np.where(matched)[0], owner[matched]].sum()
        rows, cols = linear_sum_assignment(cost)
        want = cost[rows, cols].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_auction_valid_one_to_one(rng):
    """Auction (approximate fallback) must at least be a valid matching."""
    cost = rng.uniform(0, 5, (40, 8)).astype(np.float32)
    owner = np.asarray(M.auction_assign(
        jnp.asarray(cost), jnp.ones(8, bool), jnp.ones(40, bool)))
    matched = owner >= 0
    assert matched.sum() == 8
    assert len(set(owner[matched])) == 8


def test_auction_respects_validity(rng):
    q, g = 20, 6
    cost = rng.uniform(0, 5, (q, g)).astype(np.float32)
    qv = np.ones(q, bool); qv[15:] = False
    gv = np.ones(g, bool); gv[4:] = False
    owner = np.asarray(M.auction_assign(jnp.asarray(cost), jnp.asarray(gv),
                                        jnp.asarray(qv)))
    matched = owner >= 0
    assert matched.sum() == 4
    assert not matched[15:].any()
    assert set(owner[matched]) == {0, 1, 2, 3}


def test_hungarian_assign_jv_method(rng):
    Q, G = 16, 8
    cost = rng.uniform(0, 5, (Q, G)).astype(np.float32)
    qv = np.ones(Q, bool); qv[12:] = False
    gv = np.ones(G, bool); gv[5:] = False
    assigned, pos = jax.jit(
        lambda c, q, g: M.hungarian_assign(c, q, g, method='jv'))(
        jnp.asarray(cost), jnp.asarray(qv), jnp.asarray(gv))
    assigned, pos = np.asarray(assigned), np.asarray(pos)
    assert pos.sum() == 5
    assert set(assigned[pos].tolist()) == {0, 1, 2, 3, 4}
    assert not pos[12:].any()


def test_jv_padded_rows_reserved_columns(rng):
    """Training-shaped padding: most gt rows and query columns invalid.
    The reserved-column fast path for invalid rows must not change the
    optimal assignment of the valid submatrix."""
    Q, G, qn, gn = 320, 96, 120, 23
    cost = rng.uniform(0, 5, (Q, G)).astype(np.float32)
    qv = np.zeros(Q, bool)
    qv[rng.permutation(Q)[:qn]] = True
    gv = np.zeros(G, bool)
    gv[:gn] = True                                   # data pads gt at the end
    assigned, pos = M.hungarian_assign(jnp.asarray(cost), jnp.asarray(qv),
                                       jnp.asarray(gv), method='jv')
    assigned = np.asarray(assigned)
    pos = np.asarray(pos)
    assert pos.sum() == gn
    assert np.all(qv[pos])                           # only valid queries
    assert sorted(assigned[pos]) == list(range(gn))  # each valid gt once
    got = cost[np.where(pos)[0], assigned[pos]].sum()
    sub = cost[np.ix_(qv, gv)]
    rows, cols = linear_sum_assignment(sub)
    want = sub[rows, cols].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)
