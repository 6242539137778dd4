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
    """Shipped configuration = center branch only; the optional
    cls/size/heading/attr auxiliary branches (ref query_generator.py:
    with_cls/with_size/with_heading/with_attr + per-branch conv/fc stacks,
    :240-262 build_branch / :205-238 build_predictor) are implemented but
    off by default, matching every shipped exp config."""
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    extra_channels: tuple = (512, 256)
    intrins_feat_scale: float = 0.1
    clamp_value: float = 5e3
    num_classes: int = 10
    with_cls: bool = False
    with_size: bool = False
    with_heading: bool = False
    with_attr: bool = False
    attr_dim: int = 2             # (vx, vy)
    reg_class_agnostic: bool = False
    # per-branch (convs, fcs) stack depths, 0 = predictor straight off the
    # shared/extra encoding (the reference's defaults)
    num_cls_convs: int = 0
    num_cls_fcs: int = 0
    num_size_convs: int = 0
    num_size_fcs: int = 0
    num_heading_convs: int = 0
    num_heading_fcs: int = 0
    num_center_convs: int = 0
    num_center_fcs: int = 0
    num_attr_convs: int = 0
    num_attr_fcs: int = 0

    def _branch(self, x, name: str, n_convs: int, n_fcs: int):
        """ref _add_conv_fc_branch + get_output (query_generator.py:282-332):
        convs -> (flatten if needed) -> relu(fc)*.  After the shared fc the
        input is already flat, so convs only apply when the branch runs on
        spatial features (not the shipped path - kept for API parity)."""
        for i in range(n_convs):
            assert x.ndim == 4, 'branch convs need spatial features'
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                padding=[(1, 1)] * 2,
                                name=f'{name}_conv{i}')(x))
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        for i in range(n_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels,
                                 name=f'{name}_fc{i}')(x))
        return x

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray, virtual_K: jnp.ndarray,
                 ext_t_inv: jnp.ndarray, intrins_valid: jnp.ndarray):
        """roi_feats: [R, 7, 7, C]; virtual_K/ext_t_inv: [R, 4, 4];
        intrins_valid: [R] bool (False zeroes the intrinsic feature, the
        reference's degenerate-bbox guard, mv2d_head.py:95-101).

        Returns (reference_points [R, 3] lidar frame, aux dict with 'uvd'
        and any enabled auxiliary predictions)."""
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

        x_center = self._branch(x, 'center', self.num_center_convs,
                                self.num_center_fcs)
        uvd = nn.Dense(3, name='fc_center',
                       kernel_init=nn.initializers.normal(0.001))(x_center)
        aux = {'uvd': uvd}
        if self.with_cls:
            xb = self._branch(x, 'cls', self.num_cls_convs, self.num_cls_fcs)
            aux['cls_score'] = nn.Dense(
                self.num_classes + 1, name='fc_cls',
                kernel_init=nn.initializers.normal(0.01))(xb)
        if self.with_size:
            xb = self._branch(x, 'size', self.num_size_convs,
                              self.num_size_fcs)
            out_dim = 3 if self.reg_class_agnostic else 3 * self.num_classes
            aux['size_pred'] = nn.Dense(
                out_dim, name='fc_size',
                kernel_init=nn.initializers.normal(0.001))(xb)
        if self.with_heading:
            xb = self._branch(x, 'heading', self.num_heading_convs,
                              self.num_heading_fcs)
            aux['heading_pred'] = nn.Dense(     # (sin ry, cos ry)
                2, name='fc_heading',
                kernel_init=nn.initializers.normal(0.001))(xb)
        if self.with_attr:
            xb = self._branch(x, 'attr', self.num_attr_convs,
                              self.num_attr_fcs)
            aux['attr_pred'] = nn.Dense(
                self.attr_dim, name='fc_attr',
                kernel_init=nn.initializers.normal(0.001))(xb)
        # unprojection in fp32 (the reference's force_fp32 island,
        # query_generator.py:333)
        ref_pts = center2lidar(uvd.astype(jnp.float32),
                               virtual_K.astype(jnp.float32),
                               ext_t_inv.astype(jnp.float32))
        return ref_pts, aux
