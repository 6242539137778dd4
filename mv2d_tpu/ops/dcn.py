"""Modulated deformable convolution v2 (DCNv2) for TPU.

Replaces the mmcv CUDA ModulatedDeformConv2d used in the two-frame recipe's
backbone stages 3-4 (ref: configs/mv2d/exp/..._ep24.py:28-30).

Formulation: a regular conv branch predicts per-tap offsets and modulation
masks; each of the K*K taps bilinearly samples the input at its offset
position; the output is an einsum of the stacked samples with the kernel
weights - everything lowers to gathers + one MXU contraction (no scatter,
no dynamic shapes).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _dense_bilinear(x: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray
                    ) -> jnp.ndarray:
    """x: [V, H, W, C]; sx, sy: [V, P] continuous coords. -> [V, P, C].

    Zero padding outside the map (mmcv deform-conv border rule).  Uses the
    2x2 parity block layout (ops/roi_align.make_block_layout): one 4C-wide
    gather per sample instead of four C-wide ones."""
    from .roi_align import make_block_layout
    V, H, W, C = x.shape
    inside = (sx > -1.0) & (sx < W) & (sy > -1.0) & (sy < H)
    sx = jnp.clip(sx, 0.0, W - 1)
    sy = jnp.clip(sy, 0.0, H - 1)
    x0 = jnp.floor(sx); y0 = jnp.floor(sy)
    lx = (sx - x0)[..., None]; ly = (sy - y0)[..., None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    blocks = make_block_layout(x)
    Hb, Wb = blocks.shape[2], blocks.shape[3]
    flat = blocks.reshape(-1, 4 * C)
    buf = (y0i % 2) * 2 + (x0i % 2)                        # [V, P]
    vids = jnp.arange(V, dtype=jnp.int32)[:, None]
    rows = ((buf * V + vids) * Hb + y0i // 2) * Wb + x0i // 2
    cells = flat[rows]                                     # [V, P, 4C]
    c00, c01, c10, c11 = jnp.split(cells, 4, axis=-1)
    out = (1 - ly) * (1 - lx) * c00 + (1 - ly) * lx * c01 + \
        ly * (1 - lx) * c10 + ly * lx * c11
    return jnp.where(inside[..., None], out, 0.0)


class ModulatedDeformConv(nn.Module):
    """DCNv2 3x3 conv (deform_groups=1, matching the MV2D recipe)."""
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_pallas: bool = False
                 ) -> jnp.ndarray:
        import jax
        V, H, W, C = x.shape
        K = self.kernel
        pad = K // 2
        # offset/mask branch: zero-init so training starts as a plain conv
        # (mmcv init_offset convention)
        om = nn.Conv(3 * K * K, (K, K), strides=self.stride,
                     padding=[(pad, pad)] * 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name='conv_offset')(x)
        Ho, Wo = om.shape[1], om.shape[2]
        off = om[..., :2 * K * K].reshape(V, Ho, Wo, K * K, 2)
        mask = nn.sigmoid(om[..., 2 * K * K:])              # [V, Ho, Wo, K*K]

        ys = jnp.arange(Ho, dtype=x.dtype) * self.stride - pad
        xs = jnp.arange(Wo, dtype=x.dtype) * self.stride - pad
        ky, kx = jnp.meshgrid(jnp.arange(K, dtype=x.dtype),
                              jnp.arange(K, dtype=x.dtype), indexing='ij')
        base_y = ys[:, None, None] + ky.reshape(-1)[None, None, :]
        base_x = xs[None, :, None] + kx.reshape(-1)[None, None, :]
        # [V, Ho, Wo, K*K]  (mmcv offset channel order: (dy, dx) per tap)
        sy = base_y[None] + off[..., 0]
        sx = base_x[None] + off[..., 1]
        w = self.param('kernel', nn.initializers.he_normal(),
                       (K * K, C, self.features))
        # Band-kernel routing (v5e full-block measurements, 12 views,
        # incl. offset conv + weight contraction):
        #   32x88x256 s1:  gather  9.6 ms -> band 7.9 ms   (5 blocks)
        #   16x44x512 s1:  gather  5.5 ms -> band 4.3 ms   (2 blocks)
        #   64x176x256 s2: gather 18.9 ms -> band 8.9 ms   (1 block)
        #   32x88x512 s2:  gather  8.6 ms -> band 4.5 ms   (1 block)
        # The kernel builds the bilinear stencil as a [J, Q] outer-product
        # weight panel and samples with ONE MXU dot per segment (see
        # pallas_dcn.py; the earlier y-matmul + VPU x-reduce variant lost
        # to the gathers - its [Q, ww*C] f32 intermediate dominated).
        from . import pallas_enabled
        if use_pallas and K == 3 and C % 128 == 0 and pallas_enabled():
            # band kernel with IN-KERNEL tap-weight contraction: the
            # [V,Ho,Wo,9C] modulated-samples tensor (~156 MB/stage-3 layer)
            # never reaches HBM.  No gradient (zero tangents);
            # inference only
            from .pallas_dcn import pallas_dcn_conv
            return pallas_dcn_conv(
                x, sy.astype(jnp.float32), sx.astype(jnp.float32),
                mask.astype(jnp.float32), w.astype(x.dtype),
                stride=self.stride).astype(x.dtype)
        if K == 3 and C % 128 == 0 and pallas_enabled():
            # training path on TPU: differentiable band sampling (custom
            # VJP; the backward is the transposed band algebra - one MXU
            # dot per segment instead of XLA scatter-adds); the tap-weight
            # contraction runs per tap in the sampler's NATIVE layout
            # (plain XLA dots, so dw/dsamples stay matmuls) and only the
            # F-wide output is un-permuted - the former (V, Ho, Wo, 9C)
            # sample transpose cost ~12 ms/step of data formatting
            from .pallas_dcn import dcn_modulated_conv_train
            return dcn_modulated_conv_train(
                x, sy.astype(jnp.float32), sx.astype(jnp.float32),
                mask.astype(jnp.float32), w.astype(x.dtype),
                stride=self.stride).astype(x.dtype)
        P = Ho * Wo * K * K
        samples = _dense_bilinear(x, sx.reshape(V, P), sy.reshape(V, P))
        samples = samples.reshape(V, Ho, Wo, K * K, C)
        samples = samples * mask[..., None]
        return jnp.einsum('vhwkc,kcf->vhwf', samples, w,
                          preferred_element_type=jnp.float32).astype(x.dtype)
