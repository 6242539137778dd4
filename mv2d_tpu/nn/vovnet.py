"""VoVNetV2 backbone with eSE (VoVNetCP in the reference).

Re-implements models/backbones/vovnetcp.py:288 (registered by the reference,
used by its V2-99 configs; the shipped MV2D recipes use ResNet, ref SURVEY
§2a).  One-Shot-Aggregation blocks: N successive 3x3 convs whose outputs are
all concatenated (with the input) into a 1x1 projection, gated by effective
Squeeze-Excitation, with identity residuals on non-first blocks.  The
reference's torch checkpointing (`_OSA_module` with_cp) maps to nn.remat via
the enclosing config.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import FrozenBatchNorm, max_pool_3x3_s2

SPECS = {
    # stem chs, stage conv ch, stage out ch, layers/block, blocks/stage
    19: ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024), 3,
         (1, 1, 1, 1)),
    39: ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024), 5,
         (1, 1, 2, 2)),
    57: ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024), 5,
         (1, 1, 4, 3)),
    99: ((64, 64, 128), (128, 160, 192, 224), (256, 512, 768, 1024), 5,
         (1, 3, 9, 3)),
}


def _hsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=[(pad, pad)] * 2,
                    use_bias=False, name='conv')(x)
        x = FrozenBatchNorm(self.features, name='bn')(x)
        return nn.relu(x)


class ESE(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels, (1, 1), name='fc')(s)
        return x * _hsigmoid(s)


class OSABlock(nn.Module):
    conv_ch: int
    out_ch: int
    num_layers: int
    identity: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x
        feats = [x]
        for i in range(self.num_layers):
            x = ConvBN(self.conv_ch, 3, name=f'layer_{i}')(x)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)
        x = ConvBN(self.out_ch, 1, name='concat')(x)
        x = ESE(self.out_ch, name='ese')(x)
        if self.identity and inp.shape[-1] == self.out_ch:
            x = x + inp
        return x


class VoVNet(nn.Module):
    """Returns 4 stage outputs (strides 4, 8, 16, 32), like ResNet."""
    depth: int = 99
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, fast_inference: bool = False):
        # fast_inference accepted for backbone-interface parity (no DCN here)
        stem_ch, conv_ch, out_ch, n_layers, blocks = SPECS[self.depth]
        x = ConvBN(stem_ch[0], 3, 2, name='stem_0')(x)
        x = ConvBN(stem_ch[1], 3, 1, name='stem_1')(x)
        x = ConvBN(stem_ch[2], 3, 2, name='stem_2')(x)
        outs = []
        for s in range(4):
            if s > 0:
                x = max_pool_3x3_s2(x)
            for b in range(blocks[s]):
                x = OSABlock(conv_ch[s], out_ch[s], n_layers,
                             identity=(b > 0),
                             name=f'stage{s + 2}_{b}')(x)
            if s in self.out_indices:
                outs.append(x)
        return tuple(outs)
