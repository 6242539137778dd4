"""Bucketed-padding helpers: ragged host data -> fixed device shapes."""
from __future__ import annotations

from typing import Tuple

import numpy as np


def pad_to(arr: np.ndarray, size: int, axis: int = 0, value=0
           ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad/truncate along axis to `size`; returns (padded, valid_mask)."""
    n = arr.shape[axis]
    valid = np.zeros((size,), bool)
    valid[:min(n, size)] = True
    if n == size:
        return arr, valid
    if n > size:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, size)
        return arr[tuple(sl)], valid
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, size - n)
    return np.pad(arr, pad, constant_values=value), valid


def s2d_unfold_images(x: np.ndarray) -> np.ndarray:
    """Inverse of s2d_fold_images: [V, H/2, W/2, 12] -> [V, H, W, 3]
    (visualization / debugging of pre-folded eval samples)."""
    V, H2, W2, C4 = x.shape
    C = C4 // 4
    y = x.reshape(V, H2, W2, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(y).reshape(V, H2 * 2, W2 * 2, C)


def s2d_fold_images(imgs: np.ndarray) -> np.ndarray:
    """[V, H, W, 3] -> [V, H/2, W/2, 12] space-to-depth on the host.

    Channel order (dy, dx, c) matches nn.resnet.s2d_stem_conv's in-jit
    fold; feeding pre-folded images removes the ~3 ms relayout the fold
    costs on-device at recipe shapes.  The model's stem and grid_mask
    dispatch on the 12-channel shape.
    """
    V, H, W, C = imgs.shape
    x = imgs.reshape(V, H // 2, 2, W // 2, 2, C)
    x = np.ascontiguousarray(x.transpose(0, 1, 3, 2, 4, 5))
    return x.reshape(V, H // 2, W // 2, 4 * C)
