"""Dynamic 3D query generation from 2D RoI features.

Re-implements QueryGenerator (ref: models/roi_heads/utils/
query_generator.py:19-405) with the shipped MV2D configuration
(..._ep24.py:100-112): shared 3x3 conv -> avg-pool -> shared FC(1024) ->
concat flattened virtual intrinsics (x0.1) -> 2-layer MLP (512, 256) ->
fc_center predicting (u, v, depth) in the virtual RoI frame -> analytic
unprojection to a lidar-frame 3D reference point.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..core.geometry import center2lidar


class QueryGenerator(nn.Module):
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    extra_channels: tuple = (512, 256)
    intrins_feat_scale: float = 0.1
    clamp_value: float = 5e3

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray, virtual_K: jnp.ndarray,
                 ext_t_inv: jnp.ndarray, intrins_valid: jnp.ndarray):
        """roi_feats: [R, 7, 7, C]; virtual_K/ext_t_inv: [R, 4, 4];
        intrins_valid: [R] bool (False zeroes the intrinsic feature, the
        reference's degenerate-bbox guard, mv2d_head.py:95-101).

        Returns (reference_points [R, 3] lidar frame, uvd [R, 3])."""
        x = nn.Conv(self.conv_out_channels, (3, 3), padding=[(1, 1)] * 2,
                    name='shared_conv')(roi_feats)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))                              # avg pool
        x = nn.relu(nn.Dense(self.fc_out_channels, name='shared_fc')(x))

        intrins_feat = virtual_K.reshape(-1, 16) * self.intrins_feat_scale
        intrins_feat = jnp.where(intrins_valid[:, None], intrins_feat, 0.0)
        x = jnp.concatenate([x, intrins_feat.astype(x.dtype)], axis=-1)
        x = jnp.clip(x, -self.clamp_value, self.clamp_value)
        for i, f in enumerate(self.extra_channels):
            x = nn.relu(nn.Dense(f, name=f'extra_enc_{i}')(x))
        uvd = nn.Dense(3, name='fc_center',
                       kernel_init=nn.initializers.normal(0.001))(x)
        # unprojection in fp32 (the reference's force_fp32 island,
        # query_generator.py:333)
        ref_pts = center2lidar(uvd.astype(jnp.float32),
                               virtual_K.astype(jnp.float32),
                               ext_t_inv.astype(jnp.float32))
        return ref_pts, uvd
