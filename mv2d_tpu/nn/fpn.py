"""Feature Pyramid Network (mmdet-compatible semantics, channels-last).

Covers both uses in MV2D:
  * the 2D detector's FPN: 4 backbone stages -> p2..p6 (num_outs=5, extra
    level via stride-2 max-pool, ref: configs/mv2d/detectors/
    maskrcnn_r50.py:15-19),
  * the "neck" FPN-on-FPN that selects p4 only (in_channels [256]*5,
    start_level=end_level=2, num_outs=1, ref: ..._ep24.py:32-39).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn



def _upsample_nearest_2x(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    # one broadcast + one reshape (not two stacked jnp.repeats, whose
    # intermediate [V, 2h, w, C] broadcast materialized as a ~1.4 ms/step
    # HBM pass in the eval trace) so XLA can fuse the whole upsample into
    # the consumer add
    v, h, w, c = x.shape
    th, tw = like.shape[1], like.shape[2]
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (v, h, 2, w, 2, c))
    return x.reshape(v, 2 * h, 2 * w, c)[:, :th, :tw]


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1        # inclusive, -1 = last input

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        end = self.end_level if self.end_level >= 0 else len(inputs) - 1
        used = list(range(self.start_level, end + 1))
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f'lateral_{i}')(inputs[i])
            for i in used
        ]
        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i], laterals[i - 1])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    name=f'fpn_{i}')(laterals[idx])
            for idx, i in enumerate(used)
        ]
        # extra outputs: stride-2 max-pool on the last map (mmdet
        # add_extra_convs=False behaviour used by Faster/Mask R-CNN)
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs[:self.num_outs])
