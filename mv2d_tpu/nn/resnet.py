"""ResNet-50/101 backbone (torchvision/mmdet 'pytorch' style, channels-last).

Replaces the mmdet ResNet the reference builds from config
(ref: configs/mv2d/detectors/maskrcnn_r50.py:5-14): depth 50/101, 4 stages,
out_indices (0,1,2,3), frozen BN, optional DCNv2 in chosen stages
(..._ep24.py:28-30), frozen_stages handled by the optimizer mask.

'pytorch' style = the stride-2 sits on the 3x3 conv of each bottleneck.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.dcn import ModulatedDeformConv
from .layers import FrozenBatchNorm

STAGE_BLOCKS = {
    10: (1, 1, 1, 1),   # miniature bottleneck net for tests/dry-runs
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


class Bottleneck(nn.Module):
    planes: int            # bottleneck width; out channels = planes * 4
    stride: int = 1
    downsample: bool = False
    use_dcn: bool = False

    @nn.compact
    def __call__(self, x, fast_inference: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name='conv1')(x)
        out = FrozenBatchNorm(self.planes, name='bn1')(out)
        out = nn.relu(out)
        if self.use_dcn:
            out = ModulatedDeformConv(self.planes, 3, self.stride,
                                      name='conv2')(out,
                                                    use_pallas=fast_inference)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                          padding=[(1, 1)] * 2, use_bias=False,
                          name='conv2')(out)
        out = FrozenBatchNorm(self.planes, name='bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name='conv3')(out)
        out = FrozenBatchNorm(self.planes * 4, name='bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, name='downsample_conv')(x)
            identity = FrozenBatchNorm(self.planes * 4,
                                       name='downsample_bn')(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Returns the four stage outputs (strides 4, 8, 16, 32).

    remat=True rematerializes each bottleneck in the backward pass (the
    reference's backbone with_cp=True, exp config :27)."""
    depth: int = 50
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, fast_inference: bool = False):
        blocks = STAGE_BLOCKS[self.depth]
        # fast_inference is a python bool routing flag: static under remat
        # (arg 0 is the module instance in linen's checkpointed call)
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)
        x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                    use_bias=False, name='stem_conv')(x)
        x = FrozenBatchNorm(64, name='stem_bn')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        outs = []
        planes = 64
        for stage, n in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for i in range(n):
                x = block_cls(
                    planes,
                    stride=stride if i == 0 else 1,
                    downsample=(i == 0),
                    use_dcn=self.stage_with_dcn[stage],
                    name=f'layer{stage + 1}_{i}')(x, fast_inference)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
