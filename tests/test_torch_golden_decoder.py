"""Torch golden test for the PETR decoder stack + box head.

Oracle: a torch transcription of the reference's decoder layer
(petr_transformer.py:195-311: post-norm 'self_attn, norm, cross_attn,
norm, ffn, norm' with query_pos added to q/k and raw query as value;
shared decoder post_norm :589-592) and CrossAttentionBoxHead
(cross_attention_head.py:199-238: 2-layer query embedding on
pos2posemb3d, per-layer cls (2xLinear+LN) / reg branches, sigmoid-space
center decode).  Weights flow through convert_torch_state_dict (packed
in_proj split, LN vs Linear leaf mapping), so the converter's whole
decoder surface is under test.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn                                   # noqa: E402
import torch.nn.functional as F                          # noqa: E402

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402

from mv2d_tpu.nn.decoder import CrossAttentionBoxHead    # noqa: E402
from mv2d_tpu.nn.pe import pos2posemb3d                  # noqa: E402
from mv2d_tpu.train.checkpoint import convert_torch_state_dict  # noqa: E402

C, H, FF, L = 64, 4, 128, 2
NUM_CLASSES = 10
PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


class TLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attentions = tnn.ModuleList(
            [_Attn(), _Attn()])         # 0 = self, 1 = cross
        self.ffns = tnn.ModuleList([_FFN()])
        self.norms = tnn.ModuleList([tnn.LayerNorm(C) for _ in range(3)])

    def forward(self, q, qpos, k, kpos, cross_allowed):
        # torch MHA masks are True = BLOCKED
        x = self.attentions[0].attn(q + qpos, q + qpos, q,
                                    need_weights=False)[0]
        q = self.norms[0](q + x)
        x = self.attentions[1].attn(q + qpos, k + kpos, k,
                                    attn_mask=~cross_allowed,
                                    need_weights=False)[0]
        q = self.norms[1](q + x)
        x = self.ffns[0].layers[1](F.relu(self.ffns[0].layers[0][0](q)))
        return self.norms[2](q + x)


class _Attn(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attn = tnn.MultiheadAttention(C, H, batch_first=False)


class _FFN(tnn.Module):
    def __init__(self):
        super().__init__()
        # mmcv FFN naming: layers.0.0 / layers.1
        self.layers = tnn.ModuleList(
            [tnn.Sequential(tnn.Linear(C, FF)), tnn.Linear(FF, C)])


class TBoxHead(tnn.Module):
    """mmdet-style module tree so state-dict keys match the converter."""
    def __init__(self):
        super().__init__()
        self.query_embedding = tnn.Sequential(
            tnn.Linear(C * 3 // 2, C), tnn.ReLU(), tnn.Linear(C, C))
        self.transformer = tnn.Module()
        self.transformer.decoder = tnn.Module()
        self.transformer.decoder.layers = tnn.ModuleList(
            [TLayer() for _ in range(L)])
        self.transformer.decoder.post_norm = tnn.LayerNorm(C)
        self.cls_branches = tnn.ModuleList([
            tnn.Sequential(tnn.Linear(C, C), tnn.LayerNorm(C), tnn.ReLU(),
                           tnn.Linear(C, C), tnn.LayerNorm(C), tnn.ReLU(),
                           tnn.Linear(C, NUM_CLASSES))
            for _ in range(L)])
        self.reg_branches = tnn.ModuleList([
            tnn.Sequential(tnn.Linear(C, C), tnn.ReLU(),
                           tnn.Linear(C, C), tnn.ReLU(),
                           tnn.Linear(C, 10))
            for _ in range(L)])

    def forward(self, refs, keys, kpos, cross_allowed):
        emb = torch.tensor(np.asarray(
            pos2posemb3d(jnp.asarray(refs.numpy()), C // 2)))
        qpos = self.query_embedding(emb)
        q = torch.zeros_like(qpos)
        # sequence-first layout [Q, 1, C] for nn.MultiheadAttention
        q = q[:, None]
        qp = qpos[:, None]
        k = keys[:, None]
        kp = kpos[:, None]
        outs = []
        for lyr in self.transformer.decoder.layers:
            q = lyr(q, qp, k, kp, cross_allowed)
            outs.append(self.transformer.decoder.post_norm(q)[:, 0])
        ref = torch.tensor(np.asarray(jnp.log(
            jnp.asarray(refs.numpy()) / (1 - jnp.asarray(refs.numpy())))))
        all_cls, all_box = [], []
        for lvl, out in enumerate(outs):
            cls = self.cls_branches[lvl](out)
            reg = self.reg_branches[lvl](out)
            xy = torch.sigmoid(reg[:, 0:2] + ref[:, 0:2])
            z = torch.sigmoid(reg[:, 4:5] + ref[:, 2:3])
            pr = PC_RANGE
            xy = xy * torch.tensor([pr[3] - pr[0], pr[4] - pr[1]]) + \
                torch.tensor([pr[0], pr[1]])
            z = z * (pr[5] - pr[2]) + pr[2]
            box = torch.cat([xy, reg[:, 2:4], z, reg[:, 5:]], dim=1)
            all_cls.append(cls)
            all_box.append(box)
        return torch.stack(all_cls), torch.stack(all_box)


def test_box_head_matches_torch_reference(rng):
    tmodel = TBoxHead()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.tensor(rng.normal(0, 0.05, p.shape),
                                 dtype=torch.float32))
    tmodel.eval()
    sd = {'roi_head.bbox_head.' + k: v.numpy()
          for k, v in tmodel.state_dict().items()}
    params, _ = convert_torch_state_dict(sd)
    assert params.pop('_unmatched') == 0, params['_unmatched_keys']
    params.pop('_unmatched_keys')

    Q, K = 12, 30
    refs = rng.uniform(0.2, 0.8, (Q, 3)).astype(np.float32)
    keys = rng.normal(0, 1, (K, C)).astype(np.float32)
    kpos = rng.normal(0, 1, (K, C)).astype(np.float32)
    allowed = rng.uniform(size=(Q, K)) > 0.4
    allowed[:, 0] = True              # no fully-masked rows for torch

    with torch.no_grad():
        want_cls, want_box = tmodel(
            torch.tensor(refs), torch.tensor(keys), torch.tensor(kpos),
            torch.tensor(allowed))

    jhead = CrossAttentionBoxHead(num_classes=NUM_CLASSES, embed_dims=C,
                                  num_layers=L, num_heads=H,
                                  feedforward_channels=FF, dropout=0.0,
                                  pc_range=PC_RANGE)
    got_cls, got_box = jhead.apply(
        {'params': params['bbox_head']}, jnp.asarray(refs),
        jnp.asarray(keys), jnp.asarray(kpos), None, jnp.asarray(allowed))
    np.testing.assert_allclose(np.asarray(got_cls), want_cls.numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_box), want_box.numpy(),
                               rtol=2e-3, atol=2e-3)
