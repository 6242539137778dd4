"""Hungarian set matching for DETR-style training.

Re-implements HungarianAssigner3D (ref:
mmdet3d_plugin/core/bbox/assigners/hungarian_assigner_3d.py:65-151) with the
MV2D costs:
  * FocalLossCost (weight 2.0)  - mmdet match cost on sigmoid probabilities
  * BBox3DL1Cost  (weight 0.25) - L1 over the first 8 normalized code dims
    (ref: core/bbox/match_costs/match_cost.py:6-26, exp config :136-142)

The assignment itself runs on the HOST: a C++ Jonker-Volgenant solver
(csrc/hungarian.cpp, loaded via ctypes) when built, otherwise
scipy.optimize.linear_sum_assignment - reached from compiled code through
`jax.pure_callback` with fixed [Q, G] cost shapes so the enclosing train step
stays a single XLA program.  Padded rows/columns carry a large constant cost
and are filtered after assignment.
"""
from __future__ import annotations

import ctypes
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e8

# ---------------------------------------------------------------- host solver

_clib = None


def _load_native():
    global _clib
    if _clib is not None:
        return _clib
    from ..utils.native_build import ensure_built
    path = ensure_built()
    if path:
        try:
            lib = ctypes.CDLL(path)
            lib.lap_solve.argtypes = [
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.lap_solve.restype = ctypes.c_int
            _clib = lib
            return lib
        except OSError:
            pass
    _clib = False
    return _clib


def lsa_host(cost: np.ndarray) -> np.ndarray:
    """Solve min-cost assignment on [Q, G] (Q >= G); returns col-of-row [Q]
    with -1 for unassigned rows."""
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    q, g = cost.shape
    lib = _load_native()
    if lib:
        out = np.full((q,), -1, dtype=np.int32)
        rc = lib.lap_solve(q, g,
                           cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        if rc == 0:
            return out
    from scipy.optimize import linear_sum_assignment
    rows, cols = linear_sum_assignment(cost)
    out = np.full((q,), -1, dtype=np.int32)
    out[rows] = cols
    return out


def _lsa_callback(cost: np.ndarray) -> np.ndarray:
    cost = np.nan_to_num(np.asarray(cost, dtype=np.float64),
                         nan=_BIG, posinf=_BIG, neginf=-_BIG)
    if cost.ndim == 2:
        return lsa_host(cost)
    flat = cost.reshape(-1, *cost.shape[-2:])
    out = np.stack([lsa_host(c) for c in flat])
    return out.reshape(*cost.shape[:-1])

# ----------------------------------------------------------------- costs


def focal_loss_cost(cls_logits: jnp.ndarray, gt_labels: jnp.ndarray,
                    weight: float = 2.0, alpha: float = 0.25,
                    gamma: float = 2.0, eps: float = 1e-12) -> jnp.ndarray:
    """mmdet FocalLossCost. cls_logits: [Q, C], gt_labels: [G] -> [Q, G]."""
    p = jax.nn.sigmoid(cls_logits)
    neg_cost = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos_cost = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    cost = pos_cost - neg_cost                         # [Q, C]
    return cost[:, gt_labels] * weight


def bbox3d_l1_cost(bbox_pred: jnp.ndarray, gt_code: jnp.ndarray,
                   weight: float = 0.25, ndims: int = 8) -> jnp.ndarray:
    """BBox3DL1Cost: L1 distance over first `ndims` code dims -> [Q, G]."""
    d = jnp.abs(bbox_pred[:, None, :ndims] - gt_code[None, :, :ndims])
    return d.sum(-1) * weight

# ------------------------------------------------------------- assignment


def jv_assign(cost: jnp.ndarray, gt_valid: jnp.ndarray,
              query_valid: jnp.ndarray) -> jnp.ndarray:
    """EXACT Jonker-Volgenant assignment fully on-device (no host callback -
    the axon TPU backend cannot host-call).

    Same shortest-augmenting-path algorithm as scipy/csrc, expressed with
    lax loops: one augmenting search per gt row; each Dijkstra step is
    vectorized over all Q columns.  With Q >> G (DETR matching) the search
    typically reaches an unassigned column within a few steps.

    cost: [Q, G] -> returns row4col [Q] int32 (gt index per query or -1).
    """
    Q, G = cost.shape
    inf = jnp.asarray(jnp.inf, jnp.float32)
    c = jnp.where(query_valid[:, None] & gt_valid[None, :], cost, _BIG)
    cgq = c.T.astype(jnp.float32)                    # [G, Q]

    # PADDED (invalid) gt rows dominate the augmenting cost if left at a
    # uniform _BIG: their Dijkstra linearly re-walks the assigned columns
    # until it finds a free one (~G scans each, and most of the G slots are
    # padding in typical scenes).  Give each invalid row a RESERVED invalid
    # query column at cost -1: its search sinks in ONE step.  Exactness is
    # unaffected - invalid rows never competed for valid columns (both
    # alternatives cost _BIG and the matched pair is filtered afterwards),
    # and valid rows still see _BIG on reserved columns.  If there are
    # fewer invalid columns than invalid rows (tiny configs) the excess
    # rows keep the _BIG fallback (slow but exact).
    g_ids = jnp.arange(G)
    res_col = jnp.argsort(query_valid, stable=True)[:G].astype(jnp.int32)
    res_ok = (~query_valid[res_col]) & (~gt_valid)
    cgq = cgq.at[g_ids, res_col].set(
        jnp.where(res_ok, -1.0, cgq[g_ids, res_col]))

    def augment_row(cur_row, state):
        u, v, col4row, row4col = state

        def dijkstra_cond(s):
            _, _, _, _, sink, _ = s
            return sink < 0

        def dijkstra_body(s):
            i, minval, shortest, path, sink, scanned = s
            cand = minval + cgq[i] - u[i] - v        # [Q]
            better = (~scanned) & (cand < shortest)
            shortest = jnp.where(better, cand, shortest)
            path = jnp.where(better, i, path)
            masked = jnp.where(scanned, inf, shortest)
            j = jnp.argmin(masked).astype(jnp.int32)
            minval = masked[j]
            scanned = scanned.at[j].set(True)
            free = row4col[j] < 0
            sink = jnp.where(free, j, -1)
            i = jnp.where(free, i, row4col[j])
            return i, minval, shortest, path, sink, scanned

        init = (cur_row, jnp.float32(0.0), jnp.full((Q,), inf),
                jnp.full((Q,), -1, jnp.int32), jnp.int32(-1),
                jnp.zeros((Q,), bool))
        i_f, minval, shortest, path, sink, scanned = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body, init)

        # potentials (scipy rectangular LSAP update)
        u = u.at[cur_row].add(minval)
        owned = jnp.clip(col4row, 0, Q - 1)
        # rows on the alternating tree: those whose column was scanned
        on_tree = (col4row >= 0) & scanned[owned]
        u = jnp.where(on_tree & (jnp.arange(G) != cur_row),
                      u + minval - shortest[owned], u)
        v = jnp.where(scanned, v - (minval - shortest), v)

        # augment along the path from sink
        def aug_cond(s):
            _, _, done, _ = s
            return ~done

        def aug_body(s):
            j, (c4r, r4c), _, it = s
            i = path[j]
            r4c = r4c.at[j].set(i)
            old = c4r[i]
            c4r = c4r.at[i].set(j)
            return old, (c4r, r4c), i == cur_row, it + 1

        _, (col4row, row4col), _, _ = jax.lax.while_loop(
            aug_cond, aug_body,
            (sink, (col4row, row4col), False, jnp.int32(0)))
        return u, v, col4row, row4col

    state = (jnp.zeros((G,), jnp.float32), jnp.zeros((Q,), jnp.float32),
             jnp.full((G,), -1, jnp.int32), jnp.full((Q,), -1, jnp.int32))
    u, v, col4row, row4col = jax.lax.fori_loop(0, G, augment_row, state)
    return row4col


def auction_assign(cost: jnp.ndarray, gt_valid: jnp.ndarray,
                   query_valid: jnp.ndarray, eps_scaling: int = 4,
                   iters_per_scale: int = 64) -> jnp.ndarray:
    """On-device auction algorithm: assigns every valid gt (bidder) to a
    distinct query (object), minimizing total cost to within G*eps.

    The TPU path for Hungarian matching: this PJRT backend does not support
    host callbacks, so scipy/C++ LSA is unreachable from a compiled train
    step.  Forward auction with eps-scaling is fully vectorized ([G, Q] ops
    per round) and near-optimal; DETR-style training is insensitive to the
    residual eps-suboptimality (ties between nearly-identical costs).

    cost: [Q, G] -> returns owner [Q] int32 (gt index or -1).
    """
    Q, G = cost.shape
    value = -cost.T                                  # [G, Q] maximize value
    value = jnp.where(query_valid[None, :], value, -_BIG)
    spread = jnp.maximum(value.max() - jnp.maximum(value.min(), -_BIG), 1.0)
    eps0 = spread / 8.0
    gt_ids = jnp.arange(G, dtype=jnp.int32)

    def run_scale(price, eps):
        # assignments restart each scale; prices persist (eps-scaling)
        obj_owner0 = jnp.full((Q,), -1, jnp.int32)   # gt owning object j

        def round_body(state):
            price, obj_owner, it = state
            # which gts currently own an object
            scatter_idx = jnp.where(obj_owner >= 0, obj_owner, G)
            gt_has = jnp.zeros((G + 1,), bool).at[scatter_idx].set(True)[:G]
            unassigned = gt_valid & ~gt_has                      # [G]
            net = value - price[None, :]                         # [G, Q]
            best = jnp.max(net, axis=1)
            best_j = jnp.argmax(net, axis=1).astype(jnp.int32)
            net2 = net.at[gt_ids, best_j].set(-_BIG)
            second = jnp.maximum(jnp.max(net2, axis=1), -_BIG)
            bid = price[best_j] + (best - second) + eps          # [G]
            bid = jnp.where(unassigned, bid, -_BIG)
            # winner per object = max bid, ties -> lowest gt id
            obj_bid = jnp.full((Q,), -_BIG).at[best_j].max(bid)
            is_top = unassigned & (bid >= obj_bid[best_j]) & \
                (bid > -_BIG / 2)
            cand = jnp.where(is_top, gt_ids, G)
            obj_winner = jnp.full((Q,), G, jnp.int32).at[best_j].min(cand)
            has_winner = obj_winner < G
            obj_owner = jnp.where(has_winner, obj_winner, obj_owner)
            price = jnp.where(has_winner, obj_bid, price)
            return price, obj_owner, it + 1

        def cond(state):
            price, obj_owner, it = state
            scatter_idx = jnp.where(obj_owner >= 0, obj_owner, G)
            gt_has = jnp.zeros((G + 1,), bool).at[scatter_idx].set(True)[:G]
            return jnp.any(gt_valid & ~gt_has) & (it < iters_per_scale)

        price, obj_owner, _ = jax.lax.while_loop(
            cond, round_body, (price, obj_owner0, jnp.int32(0)))
        return price, obj_owner

    price = jnp.zeros((Q,))
    obj_owner = jnp.full((Q,), -1, jnp.int32)
    for s in range(eps_scaling):
        price, obj_owner = run_scale(price, eps0 / (4.0 ** s))
    return obj_owner


def hungarian_assign(cost: jnp.ndarray, query_valid: jnp.ndarray,
                     gt_valid: jnp.ndarray,
                     method: str | None = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape set assignment.

    cost: [Q, G], query_valid: [Q], gt_valid: [G].
    Returns (assigned_gt [Q] int32, -1 if unmatched/background;
             pos_mask [Q] bool).
    Every valid gt is matched to exactly one valid query (assuming
    #valid queries >= #valid gts, as in DETR training).

    method: 'callback' = exact host LSA (C++ JV / scipy) via pure_callback;
    'jv' = exact on-device Jonker-Volgenant (the axon TPU backend cannot
    host-call); 'auction' = approximate on-device auction.
    Default: jv on TPU, callback elsewhere.
    """
    Q, G = cost.shape
    # matching is not differentiated (ref detaches the cost matrix,
    # hungarian_assigner_3d.py:130); also required for pure_callback under AD
    cost = jax.lax.stop_gradient(cost)
    c = jnp.where(query_valid[:, None] & gt_valid[None, :], cost, _BIG)
    if method is None:
        method = 'jv' if jax.default_backend() == 'tpu' else 'callback'
    if method == 'jv':
        assigned = jv_assign(c, gt_valid, query_valid)
    elif method == 'auction':
        assigned = auction_assign(c, gt_valid, query_valid)
    else:
        # invalid gt columns get a uniform huge cost; the solver still
        # assigns them (rectangular LSA assigns all G columns when Q >= G)
        # but the resulting pairs are filtered below.
        assigned = jax.pure_callback(
            _lsa_callback,
            jax.ShapeDtypeStruct((Q,), jnp.int32),
            c, vmap_method="sequential")
    matched_gt_ok = jnp.where(assigned >= 0,
                              gt_valid[jnp.clip(assigned, 0, G - 1)], False)
    pos = (assigned >= 0) & matched_gt_ok & query_valid
    assigned = jnp.where(pos, assigned, -1)
    return assigned, pos
