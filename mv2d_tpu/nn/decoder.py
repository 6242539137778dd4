"""PETR-style transformer decoder with sparse cross-attention + box head.

Re-implements the reference decoder stack TPU-native:
  * MV2DTransformer / PETRTransformerDecoder(Layer)   (ref: models/roi_heads/
    bbox_heads/cross_attention_head.py:23-49, models/utils/
    petr_transformer.py:195-311, 547-593)
  * FlattenMHSelfAttention - global self-attention over ALL queries folded
    into one sequence (petr_transformer.py:346-351)
  * PETRMultiheadAttention cross-attention with per-query key masks
  * CrossAttentionBoxHead - query embedding from reference points, per-layer
    cls/reg branches, sigmoid-space center decode
    (cross_attention_head.py:87-242)

Layer order is post-norm ('self_attn','norm','cross_attn','norm','ffn','norm')
with an extra shared LayerNorm applied to every intermediate output
(decoder post_norm, petr_transformer.py:589-592).

Masks are "allowed" booleans (True = may attend).  Two key layouts:
  * pixel mode: shared key set [K, C] with per-query mask [Q, K]
    (MV2D / MV2DT pixel-level correlation),
  * roi mode: per-query key sets [Q, Kq, C] with mask [Q, Kq]
    (MV2D-S RoI-level correlation, mv2d_s_head.py:184-192).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.geometry import inverse_sigmoid
from ..ops.attention import multi_head_attention
from .pe import pos2posemb3d


class MHA(nn.Module):
    """Multi-head attention with separate q/k/v/out projections.

    use_flash routes shared-key masked attention through the Pallas flash
    kernel (inference path; keeps logits in VMEM instead of a [H, Q, K] HBM
    buffer)."""
    embed_dims: int = 256
    num_heads: int = 8
    attn_drop: float = 0.1
    proj_drop: float = 0.1
    use_flash: bool = False
    # name of an env var that, when '1', forces the XLA attention even if
    # use_flash is set (A/B knob: the [Q, Q] training self-attn is tiny in
    # FLOPs and the flash grid walk is pure overhead there)
    flash_env_gate: str = ''

    @nn.compact
    def __call__(self, q, k, v, allowed, deterministic: bool = True):
        """q: [B, Q, C]; k, v: [B, K, C]; allowed: [B, Q, K] or None."""
        import os as _os
        qp = nn.Dense(self.embed_dims, name='q_proj')(q)
        kp = nn.Dense(self.embed_dims, name='k_proj')(k)
        vp = nn.Dense(self.embed_dims, name='v_proj')(v)
        from ..ops import pallas_enabled
        if (self.use_flash and allowed is not None
                and q.shape[0] == 1 and allowed.ndim == 3
                and pallas_enabled()
                and not (self.flash_env_gate and _os.environ.get(
                    self.flash_env_gate) == '1')):
            # real-TPU only: interpret-mode flash on CPU is far slower than
            # the XLA attention (the kernel itself is tested via interpret).
            # Training uses it too: the custom VJP keeps the backward out of
            # HBM as well (neither path applies attention dropout; the proj
            # dropout below is outside the kernel)
            from ..ops.pallas_attention import masked_flash_attention
            # bf16 panels keep the kernel inside the 16 MB VMEM budget
            # sparse=deterministic: the block-sparse grid wins at eval;
            # training measured FASTER all-dense (294.5 ms/scene vs
            # 307.1 'mixed' sparse-fwd+dense-bwd vs 305.4 all-sparse:
            # DN-padded query masks are near-dense at tile granularity,
            # so the block-list walk only adds loop overhead)
            out = masked_flash_attention(
                qp[0].astype(jnp.bfloat16), kp[0].astype(jnp.bfloat16),
                vp[0].astype(jnp.bfloat16), allowed[0],
                self.num_heads,
                sparse=deterministic)[None].astype(qp.dtype)
        else:
            out = multi_head_attention(qp, kp, vp, self.num_heads, allowed)
        out = nn.Dense(self.embed_dims, name='out_proj')(out)
        return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)


class FFN(nn.Module):
    embed_dims: int = 256
    feedforward_channels: int = 2048
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.relu(nn.Dense(self.feedforward_channels, name='fc1')(x))
        h = nn.Dropout(self.drop, deterministic=deterministic)(h)
        h = nn.Dense(self.embed_dims, name='fc2')(h)
        return nn.Dropout(self.drop, deterministic=deterministic)(h)


class PETRDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    dropout: float = 0.1
    use_flash: bool = False

    @nn.compact
    def __call__(self, query, query_pos, keys, key_pos,
                 self_allowed, cross_allowed, deterministic: bool = True):
        """query/query_pos: [Q, C]; keys/key_pos: [K, C] (pixel mode) or
        [Q, Kq, C] (roi mode); self_allowed: [Q, Q] or None;
        cross_allowed: [Q, K] or [Q, Kq]."""
        # --- global self attention over all queries (one folded sequence);
        # use_flash only engages when a mask exists (the DN block mask in
        # training) - eval's mask-free self-attn stays on the XLA path
        qs = (query + query_pos)[None]
        sa = MHA(self.embed_dims, self.num_heads, self.dropout, self.dropout,
                 use_flash=self.use_flash,
                 flash_env_gate='MV2D_SELF_ATTN_XLA', name='self_attn')(
            qs, qs, query[None],
            None if self_allowed is None else self_allowed[None],
            deterministic)[0]
        query = nn.LayerNorm(name='norm1')(query + sa)
        # --- sparse cross attention
        qc = (query + query_pos)
        if keys.ndim == 2:      # pixel mode: shared keys
            ca = MHA(self.embed_dims, self.num_heads, self.dropout,
                     self.dropout, use_flash=self.use_flash,
                     name='cross_attn')(
                qc[None], (keys + key_pos)[None], keys[None],
                cross_allowed[None], deterministic)[0]
        else:                   # roi mode: per-query keys -> query as batch
            ca = MHA(self.embed_dims, self.num_heads, self.dropout,
                     self.dropout, name='cross_attn')(
                qc[:, None], keys + key_pos, keys,
                cross_allowed[:, None], deterministic)[:, 0]
        query = nn.LayerNorm(name='norm2')(query + ca)
        # --- FFN
        ff = FFN(self.embed_dims, self.feedforward_channels, self.dropout,
                 name='ffn')(query, deterministic)
        return nn.LayerNorm(name='norm3')(query + ff)


class PETRDecoder(nn.Module):
    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    dropout: float = 0.1
    remat: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(self, query, query_pos, keys, key_pos,
                 self_allowed, cross_allowed, deterministic: bool = True):
        post_norm = nn.LayerNorm(name='post_norm')
        outs = []
        layer_cls = PETRDecoderLayer
        if self.remat:
            layer_cls = nn.remat(PETRDecoderLayer, static_argnums=(7,))
        for i in range(self.num_layers):
            query = layer_cls(self.embed_dims, self.num_heads,
                              self.feedforward_channels, self.dropout,
                              self.use_flash,
                              name=f'layer_{i}')(
                query, query_pos, keys, key_pos, self_allowed,
                cross_allowed, deterministic)
            outs.append(post_norm(query))
        return jnp.stack(outs)                              # [L, Q, C]


class ClsBranch(nn.Module):
    embed_dims: int = 256
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Dense(self.embed_dims, name=f'fc{i}')(x)
            x = nn.LayerNorm(name=f'ln{i}')(x)
            x = nn.relu(x)
        # focal-loss prior bias init (ref cross_attention_head.py:192-197)
        return nn.Dense(self.num_classes, name='out',
                        bias_init=nn.initializers.constant(-4.595))(x)


class RegBranch(nn.Module):
    embed_dims: int = 256
    code_size: int = 10

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.relu(nn.Dense(self.embed_dims, name=f'fc{i}')(x))
        return nn.Dense(self.code_size, name='out')(x)


class CrossAttentionBoxHead(nn.Module):
    """Query embed -> decoder -> per-layer class scores + box codes.

    Returns (all_cls_scores [L, Q, num_classes],
             all_bbox_preds [L, Q, code_size]) with centers decoded to lidar
    coordinates via sigmoid-space offsets from the reference points
    (ref: cross_attention_head.py:216-238).
    """
    num_classes: int = 10
    embed_dims: int = 256
    code_size: int = 10
    num_layers: int = 6
    num_heads: int = 8
    feedforward_channels: int = 2048
    dropout: float = 0.1
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    remat: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(self, reference_points, keys, key_pos,
                 self_allowed, cross_allowed, deterministic: bool = True):
        """reference_points: [Q, 3] NORMALIZED (pc_range frame)."""
        emb = pos2posemb3d(reference_points, self.embed_dims // 2)
        query_pos = nn.Dense(self.embed_dims, name='query_embedding_0')(emb)
        query_pos = nn.Dense(self.embed_dims,
                             name='query_embedding_1')(nn.relu(query_pos))
        query = jnp.zeros_like(query_pos)
        outs = PETRDecoder(self.num_layers, self.embed_dims, self.num_heads,
                           self.feedforward_channels, self.dropout,
                           remat=self.remat, use_flash=self.use_flash,
                           name='decoder')(
            query, query_pos, keys, key_pos, self_allowed, cross_allowed,
            deterministic)
        reference = inverse_sigmoid(reference_points)
        all_cls, all_box = [], []
        for lvl in range(self.num_layers):
            cls = ClsBranch(self.embed_dims, self.num_classes,
                            name=f'cls_branch_{lvl}')(outs[lvl])
            reg = RegBranch(self.embed_dims, self.code_size,
                            name=f'reg_branch_{lvl}')(outs[lvl])
            xy = nn.sigmoid(reg[..., 0:2] + reference[..., 0:2])
            z = nn.sigmoid(reg[..., 4:5] + reference[..., 2:3])
            pr = self.pc_range
            xy = xy * jnp.asarray([pr[3] - pr[0], pr[4] - pr[1]]) + \
                jnp.asarray([pr[0], pr[1]])
            z = z * (pr[5] - pr[2]) + pr[2]
            box = jnp.concatenate([xy, reg[..., 2:4], z, reg[..., 5:]],
                                  axis=-1)
            all_cls.append(cls)
            all_box.append(box)
        return jnp.stack(all_cls), jnp.stack(all_box)
