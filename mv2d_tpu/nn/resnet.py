"""ResNet-50/101 backbone (torchvision/mmdet 'pytorch' style, channels-last).

Replaces the mmdet ResNet the reference builds from config
(ref: configs/mv2d/detectors/maskrcnn_r50.py:5-14): depth 50/101, 4 stages,
out_indices (0,1,2,3), frozen BN, optional DCNv2 in chosen stages
(..._ep24.py:28-30), frozen_stages handled by the optimizer mask.

'pytorch' style = the stride-2 sits on the 3x3 conv of each bottleneck.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dcn import ModulatedDeformConv
from .layers import FrozenBatchNorm, conv1x1_dot, max_pool_3x3_s2

STAGE_BLOCKS = {
    10: (1, 1, 1, 1),   # miniature bottleneck net for tests/dry-runs
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


def s2d_stem_conv(x: jnp.ndarray, w7: jnp.ndarray,
                  prefolded: bool = False) -> jnp.ndarray:
    """7x7/s2 pad-3 stem conv as space-to-depth + 4x4/s1 - exact same math.

    A C_in=3 conv wastes the MXU's 128-lane contraction (the whole stem
    measured 10.3 ms of the backbone's ~31 ms on v5e); folding a 2x2
    space-to-depth into the kernel runs it as a dense 48->64 contraction.
    out[y,x] = sum_{a,b} W7[a,b] in[2y+a-3, 2x+b-3] with tap row
    a = 2e+dy-1 for s2d tile row e, subpixel dy - so W4[e,f,(dy,dx,c)] =
    W7pad[2e+dy, 2f+dx, c] is a pure reshape of the zero-padded kernel and
    gradients flow to the original checkpoint-shaped parameter.
    """
    O = w7.shape[-1]
    C = w7.shape[-2]
    a = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))        # [8, 8, C, O]
    w4 = a.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    w4 = w4.reshape(4, 4, 4 * C, O)
    if prefolded:
        # x already [V, H/2, W/2, 4C] in (dy, dx, c) channel order
        V, _, _, _ = x.shape
        x2 = x
        H = x.shape[1] * 2
        W = x.shape[2] * 2
    else:
        V, H, W, _ = x.shape
        x2 = x.reshape(V, H // 2, 2, W // 2, 2, C)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(V, H // 2, W // 2,
                                                    4 * C)
    if os.environ.get('MV2D_STEM_GEMM'):
        # im2col-GEMM experiment (16 shifted taps concat -> one K=192
        # matmul): measured SLOWER in-net (train 409 -> 419 ms/scene) -
        # XLA materializes the 830 MB cols tensor instead of fusing the
        # concat into the matmul operand.  Kept opt-in for revival as a
        # Pallas kernel with VMEM-resident cols.
        H2, W2 = H // 2, W // 2
        xp = jnp.pad(x2, ((0, 0), (2, 1), (2, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, dy:dy + H2, dx:dx + W2, :]
             for dy in range(4) for dx in range(4)], axis=-1)
        out = jax.lax.dot_general(
            cols.reshape(-1, 16 * 4 * C),
            w4.astype(x.dtype).reshape(16 * 4 * C, O),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.reshape(V, H2, W2, O).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x2, w4.astype(x.dtype), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class FoldedConv(nn.Module):
    """Conv with a frozen-BN affine folded into its weights: y = conv(x;
    kernel * s) + b.  Param-tree compatible with nn.Conv(use_bias=False)
    (same 'kernel' name/shape/init), so checkpoints are unaffected; the
    fold is exact (the BN stats are constants and its affine params are
    excluded from optimization) and removes the separate [V, H, W, C]
    elementwise pass + its backward reductions (~8 ms/train-step)."""
    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    stride: int = 1

    @nn.compact
    def __call__(self, x, s, b):
        kh, kw = self.kernel_size
        k = self.param('kernel', nn.initializers.lecun_normal(),
                       (kh, kw, x.shape[-1], self.features))
        k = (k * s).astype(x.dtype)
        if (kh, kw) == (1, 1) and os.environ.get('MV2D_BACKBONE_1X1_DOT'):
            # dot form won standalone (~3x off the bandwidth floor,
            # tools/conv_experiments.py) but LOSES in-net: the reshape
            # breaks XLA's cross-conv layout chaining (bench 9.64 -> 8.4
            # with it on). Opt-in for future revival.
            return conv1x1_dot(x, k, b, stride=self.stride)
        pad = [((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)]
        y = jax.lax.conv_general_dilated(
            x, k, (self.stride, self.stride), pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + b.astype(y.dtype)


class Bottleneck(nn.Module):
    # whole-STAGE fusion (incl. this block) lives in ops/pallas_stage.py /
    # ResNet._fused_chain; the earlier per-block fused kernel was removed
    # after losing to both (docs/PERF.md autopsy, git history)
    planes: int            # bottleneck width; out channels = planes * 4
    stride: int = 1
    downsample: bool = False
    use_dcn: bool = False

    @nn.compact
    def __call__(self, x, fast_inference: bool = False):
        identity = x
        s1, b1 = FrozenBatchNorm(self.planes, name='bn1').fold()
        out = FoldedConv(self.planes, (1, 1), name='conv1')(x, s1, b1)
        out = nn.relu(out)
        if self.use_dcn:
            # the deformable conv keeps its separate BN (the tap-weight
            # contraction lives inside the DCN op)
            out = ModulatedDeformConv(self.planes, 3, self.stride,
                                      name='conv2')(out,
                                                    use_pallas=fast_inference)
            out = FrozenBatchNorm(self.planes, name='bn2')(out)
        else:
            s2, b2 = FrozenBatchNorm(self.planes, name='bn2').fold()
            out = FoldedConv(self.planes, (3, 3), stride=self.stride,
                             name='conv2')(out, s2, b2)
        out = nn.relu(out)
        s3, b3 = FrozenBatchNorm(self.planes * 4, name='bn3').fold()
        out = FoldedConv(self.planes * 4, (1, 1), name='conv3')(out, s3, b3)
        if self.downsample:
            sd, bd = FrozenBatchNorm(self.planes * 4,
                                     name='downsample_bn').fold()
            identity = FoldedConv(self.planes * 4, (1, 1),
                                  stride=self.stride,
                                  name='downsample_conv')(x, sd, bd)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Returns the four stage outputs (strides 4, 8, 16, 32).

    remat=True rematerializes each bottleneck in the backward pass (the
    reference's backbone with_cp=True, exp config :27)."""
    depth: int = 50
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    remat: bool = False
    # reference maskrcnn_r50.py:10: stem + layer1 frozen.  Implemented as
    # a stop_gradient on the frozen stages' outputs (torch-equivalent:
    # frozen params + frozen inputs => requires_grad=False activations),
    # so XLA DCEs their entire backward instead of computing gradients
    # the optimizer mask would discard (~9% of the train step).
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, fast_inference: bool = False):
        blocks = STAGE_BLOCKS[self.depth]
        # fast_inference is a python bool routing flag: static under remat
        # (arg 0 is the module instance in linen's checkpointed call)
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                     if self.remat else Bottleneck)
        s_bn, b_bn = FrozenBatchNorm(64, name='stem_bn').fold()
        if x.shape[3] == 12:
            # PRE-FOLDED s2d input [V, H/2, W/2, 12] (channel order
            # (dy, dx, c)): the host pipeline did the 2x2 fold during its
            # normalize/pad copy, removing the ~3 ms in-jit relayout that
            # s2d_stem_conv's reshape+transpose cost at recipe shapes
            if self.is_initializing():
                # materialize the checkpoint-shaped stem param
                nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                        use_bias=False, name='stem_conv')(
                    jnp.zeros((1, 8, 8, 3), x.dtype))
            k = self.get_variable('params', 'stem_conv')['kernel']
            x = s2d_stem_conv(x, k * s_bn, prefolded=True) \
                + b_bn.astype(x.dtype)
        elif (self.is_initializing() or x.shape[1] % 2 or x.shape[2] % 2
                or x.shape[3] != 3):
            x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3)] * 2,
                        use_bias=False, name='stem_conv')(x)
            x = x * s_bn.astype(x.dtype) + b_bn.astype(x.dtype)
        else:
            # same parameter, space-to-depth form (see s2d_stem_conv),
            # frozen-BN affine folded into the kernel
            k = self.get_variable('params', 'stem_conv')['kernel']
            x = s2d_stem_conv(x, k * s_bn) + b_bn.astype(x.dtype)
        # NOTE a relu-after-pool swap (exact: relu is monotone) measured
        # NEUTRAL (12.29 vs 12.35 s/s): the 1.95 ms stem-output pass is a
        # layout copy of [12, 256, 704, 64] (the bias-add and relu ride it
        # for free), not the relu itself - moving the relu just unfuses it
        x = nn.relu(x)
        x = max_pool_3x3_s2(x, fast_inference=fast_inference)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        planes = 64
        from ..ops import pallas_enabled
        # fused bottleneck-chain band kernels (ops/pallas_stage.py v2:
        # im2col 3x3 matmuls): stage 1 fuses whole (incl the projection
        # block); MV2D_FUSED_STAGES=all additionally fuses later DCN-free
        # stages' identity tails (blocks 1..n-1; the stride-2 block 0
        # stays on XLA - measured a small net LOSS at C>=128, where the
        # per-tap matmuls already run at full contraction depth and the
        # kernel only adds roll/boundary costs); =0 restores pure XLA.
        fuse_mode = os.environ.get('MV2D_FUSED_STAGES', '1')
        fuse_ok = (fuse_mode != '0'
                   and fast_inference and pallas_enabled()
                   and not self.is_initializing())
        for stage, n in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            can_fuse = (fuse_ok and not self.stage_with_dcn[stage]
                        and (stage == 0 or fuse_mode == 'all')
                        and (x.shape[1] // stride) % 32 == 0
                        and x.shape[2] // stride >= 24)
            if can_fuse and stage == 0 and x.shape[-1] == planes:
                # the block submodules' params exist from init and are
                # read + BN-folded here, so checkpoints are unaffected
                x = self._fused_chain(x, stage, 0, n, planes, has_ds=True)
            else:
                tail = n if not (can_fuse and stage > 0 and n > 1) else 1
                for i in range(tail):
                    x = block_cls(
                        planes,
                        stride=stride if i == 0 else 1,
                        downsample=(i == 0),
                        use_dcn=self.stage_with_dcn[stage],
                        name=f'layer{stage + 1}_{i}')(x, fast_inference)
                if tail < n:
                    x = self._fused_chain(x, stage, 1, n, planes,
                                          has_ds=False)
            if stage < self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)

    def _fused_chain(self, x, stage, b0, n, planes, has_ds):
        from ..ops.pallas_stage import fused_identity_chain, fused_stage1

        def fold(p, c, conv, bn):
            k = p[conv]['kernel']
            s = p[bn]['scale'] / jnp.sqrt(c[bn]['var'] + 1e-5)
            return k * s, p[bn]['bias'] - c[bn]['mean'] * s

        blocks = []
        for i in range(b0, n):
            p = self.get_variable('params', f'layer{stage + 1}_{i}')
            c = self.get_variable('constants', f'layer{stage + 1}_{i}')
            k1, b1 = fold(p, c, 'conv1', 'bn1')
            k2, b2 = fold(p, c, 'conv2', 'bn2')
            k3, b3 = fold(p, c, 'conv3', 'bn3')
            blk = dict(w1=k1[0, 0], b1=b1, w2=k2, b2=b2, w3=k3[0, 0], b3=b3)
            if i == 0 and has_ds:
                kd, bd = fold(p, c, 'downsample_conv', 'downsample_bn')
                blk['wd'] = kd[0, 0]
                blk['bd'] = bd
            blocks.append(blk)
        if has_ds:
            return fused_stage1(x, blocks, planes)
        return fused_identity_chain(x, blocks, planes)
