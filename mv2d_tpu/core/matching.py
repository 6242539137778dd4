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
    path = os.path.join(os.path.dirname(__file__), os.pardir, os.pardir,
                        "csrc", "build", "libmv2d_host.so")
    path = os.path.abspath(path)
    if os.path.exists(path):
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


def hungarian_assign(cost: jnp.ndarray, query_valid: jnp.ndarray,
                     gt_valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape Hungarian assignment via host callback.

    cost: [Q, G], query_valid: [Q], gt_valid: [G].
    Returns (assigned_gt [Q] int32, -1 if unmatched/background;
             pos_mask [Q] bool).
    Every valid gt is matched to exactly one valid query (assuming
    #valid queries >= #valid gts, as in DETR training).
    """
    Q, G = cost.shape
    # matching is not differentiated (ref detaches the cost matrix,
    # hungarian_assigner_3d.py:130); also required for pure_callback under AD
    cost = jax.lax.stop_gradient(cost)
    c = jnp.where(query_valid[:, None] & gt_valid[None, :], cost, _BIG)
    # invalid gt columns get a uniform huge cost; the solver still assigns
    # them (rectangular LSA assigns all G columns when Q >= G) but the
    # resulting pairs are filtered below.
    assigned = jax.pure_callback(
        _lsa_callback,
        jax.ShapeDtypeStruct((Q,), jnp.int32),
        c, vmap_method="sequential")
    matched_gt_ok = jnp.where(assigned >= 0,
                              gt_valid[jnp.clip(assigned, 0, G - 1)], False)
    pos = (assigned >= 0) & matched_gt_ok & query_valid
    assigned = jnp.where(pos, assigned, -1)
    return assigned, pos
