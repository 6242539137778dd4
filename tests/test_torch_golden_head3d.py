"""COMPOSED torch golden for the full 3D RoI-head pipeline.

Oracle: a faithful torch transcription of the reference head from proposals
to decoded 3D boxes (ref: mv2d_head.py:103-186 _bbox_forward +
pe.py:84-169 PE.forward + positional_encoding.py:15-96 (sine PE) +
query_generator.py:343-405 + box_correlation.py:95-193 +
cross_attention_head.py:199-238 + nms_free_coder.py:49-102), run on ONE
fixed input against the JAX `MV2D.roi_head_forward` through
`convert_torch_state_dict` - so the converter, PE channel packing, virtual
intrinsics, adaptive RoIAlign, epipolar correlation masks, decoder and the
NMS-free decode are all under test AS A COMPOSITION, in pixel mode
(MV2D/MV2D-T head) AND roi mode (MV2D-S head, non-DN eval path).

Per-stage max errors are recorded in docs/PARITY.md ("Composed 3D-head
golden" table).
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn                                   # noqa: E402
import torch.nn.functional as F                          # noqa: E402

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402

from mv2d_tpu import configs                             # noqa: E402
from mv2d_tpu.core.geometry import (prepare_camera_params,  # noqa: E402
                                    virtual_intrinsics)
from mv2d_tpu.models.correlation import CorrelationConfig   # noqa: E402
from mv2d_tpu.models.detector2d import (DetectionProposalCfg,  # noqa: E402
                                        Proposals)
from mv2d_tpu.models.mv2d import MV2D, MV2DConfig        # noqa: E402
from mv2d_tpu.train.checkpoint import convert_torch_state_dict  # noqa: E402

# --------------------------------------------------------------- test dims
C, HEADS, LAYERS, FF = 64, 4, 2, 128
DEPTH_NUM = 8                 # PE depth bins
NUM_CLASSES = 10
V, P = 2, 4                   # views, proposal slots per view
PAD = (128, 192)              # padded input image (H, W)
STRIDE = 16
FH, FW = PAD[0] // STRIDE, PAD[1] // STRIDE
ROI = 7
PC_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
POS_RANGE = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
TOPK = 2
MAX_NUM = 24


def _rig():
    """Two cameras 55 deg apart with overlapping frusta (f=170 at 192 px)."""
    Ks, Es = [], []
    for i in range(V):
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 170.0
        K[0, 2], K[1, 2] = PAD[1] / 2, PAD[0] / 2
        ang = math.radians(55.0) * i
        Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
        R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64) @ Rz
        E = np.eye(4)
        E[:3, :3] = R
        E[:3, 3] = -R @ np.array([0.3 * i, 0.1 * i, 0.0])
        Ks.append(K)
        # reference convention: lidar2img = K @ E.T (query_generator.py:338)
        Es.append(E.T)
    return np.stack(Ks), np.stack(Es)


# ======================================================== torch transcription

def t_pos2posemb3d(pos, num_pos_feats):
    """ref pe.py:21-33."""
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode='floor')
                        / num_pos_feats)
    out = []
    for i in (1, 0, 2):                                  # (y, x, z)
        p = pos[..., i, None] / dim_t
        p = torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()),
                        dim=-1).flatten(-2)
        out.append(p)
    return torch.cat(out, dim=-1)


def t_sine_pe_3d(mask, num_feats, stride):
    """ref positional_encoding.py:58-96 (normalize=True, scale=2pi);
    mask: [B, N, H, W] bool (True = padding)."""
    eps = 1e-6
    scale = 2 * math.pi
    not_mask = 1 - mask.to(torch.int)
    n_embed = not_mask.cumsum(1, dtype=torch.float32)
    y_embed = not_mask.cumsum(2, dtype=torch.float32)
    x_embed = not_mask.cumsum(3, dtype=torch.float32)
    if stride > 0:
        y_embed = (y_embed - 0.5) * stride
        x_embed = (x_embed - 0.5) * stride
    n_embed = n_embed / (n_embed[:, -1:, :, :] + eps) * scale
    y_embed = y_embed / (y_embed[:, :, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode='floor')
                        / num_feats)
    outs = []
    for e in (n_embed, y_embed, x_embed):
        p = e[..., None] / dim_t
        p = torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()),
                        dim=4).flatten(4)
        outs.append(p)
    # channel order (n, y, x) -> [B, N, C, H, W]
    return torch.cat(outs, dim=4).permute(0, 1, 4, 2, 3)


class TSE(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(c, c, 1, bias=True)
        self.conv_expand = tnn.Conv2d(c, c, 1, bias=True)

    def forward(self, x, x_se):
        s = self.conv_expand(F.relu(self.conv_reduce(x_se)))
        return x * torch.sigmoid(s)


class TPE(tnn.Module):
    """ref pe.py:51-169, LID=True, with_fpe=True, adapt_pos3d=True."""
    def __init__(self):
        super().__init__()
        self.position_encoder = tnn.Sequential(
            tnn.Conv2d(3 * DEPTH_NUM, C * 4, 1), tnn.ReLU(),
            tnn.Conv2d(C * 4, C, 1))
        self.adapt_pos3d = tnn.Sequential(
            tnn.Conv2d(C * 3 // 2, C * 4, 1), tnn.ReLU(),
            tnn.Conv2d(C * 4, C, 1))
        self.fpe = TSE(C)

    def forward(self, x, lidar2img, img_shapes):
        # masks at full res -> nearest interpolate (ref pe.py:146-155)
        masks = x.new_ones((1, V, PAD[0], PAD[1]))
        for i in range(V):
            masks[0, i, :img_shapes[i][0], :img_shapes[i][1]] = 0
        masks = F.interpolate(masks, size=x.shape[-2:]).to(torch.bool)

        # position_encoding (ref pe.py:84-135), float64 islands
        eps = 1e-3
        H, W = x.shape[-2:]
        coords_h = (torch.arange(H).double() + 0.5) * PAD[0] / H - 0.5
        coords_w = (torch.arange(W).double() + 0.5) * PAD[1] / W - 0.5
        index = torch.arange(DEPTH_NUM).double()
        bin_size = (POS_RANGE[3] - 1.0) / (DEPTH_NUM * (1 + DEPTH_NUM))
        coords_d = 1.0 + bin_size * index * (index + 1)
        D = DEPTH_NUM
        coords = torch.stack(
            torch.meshgrid([coords_w, coords_h, coords_d],
                           indexing='ij')).permute(1, 2, 3, 0)  # W, H, D, 3
        coords = torch.cat((coords, torch.ones_like(coords[..., :1])), -1)
        coords[..., :2] = coords[..., :2] * torch.maximum(
            coords[..., 2:3], torch.ones_like(coords[..., 2:3]) * eps)
        img2lidars = torch.tensor(
            np.linalg.inv(lidar2img), dtype=torch.float64)  # [V, 4, 4]
        coords = coords.view(1, 1, W, H, D, 4, 1).repeat(1, V, 1, 1, 1, 1, 1)
        i2l = img2lidars.view(1, V, 1, 1, 1, 4, 4).repeat(1, 1, W, H, D, 1, 1)
        coords3d = torch.matmul(i2l, coords).squeeze(-1)[..., :3]
        for k in range(3):
            coords3d[..., k:k + 1] = \
                (coords3d[..., k:k + 1] - POS_RANGE[k]) / \
                (POS_RANGE[k + 3] - POS_RANGE[k])
        coords3d = coords3d.permute(0, 1, 4, 5, 3, 2).contiguous() \
            .view(V, -1, H, W)                           # channels = d*3 + c
        x_c = coords3d.clamp(min=0, max=1)
        x1 = x_c.clamp(min=1e-5)
        x2 = (1 - x_c).clamp(min=1e-5)
        coords3d = torch.log(x1 / x2).float()            # mmdet inverse_sigmoid
        cpe = self.position_encoder(coords3d)
        cpe = self.fpe(cpe, x)
        sin_embed = t_sine_pe_3d(masks, C // 2, STRIDE)
        sin_embed = self.adapt_pos3d(sin_embed.flatten(0, 1))
        return cpe + sin_embed                           # [V, C, H, W]


class TConvModule(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, padding=1)

    def forward(self, x):
        return F.relu(self.conv(x))


class TQueryGenerator(tnn.Module):
    """ref query_generator.py with the shipped config: 1 shared conv,
    avg pool, 1 shared fc, extra_enc over concat(intrinsic x 0.1)."""
    def __init__(self):
        super().__init__()
        self.shared_convs = tnn.ModuleList([TConvModule(C, C)])
        self.shared_fcs = tnn.ModuleList([tnn.Linear(C, C * 4)])
        self.extra_enc = tnn.Sequential(
            tnn.Linear(C * 4 + 16, C * 2), tnn.ReLU(),
            tnn.Linear(C * 2, C), tnn.ReLU())
        self.fc_center = tnn.Linear(C, 3)

    def forward(self, x, intrinsics, extrinsics, intrins_feat):
        x = self.shared_convs[0](x)
        x = F.avg_pool2d(x, ROI).flatten(1)
        x = F.relu(self.shared_fcs[0](x))
        x = torch.cat([x, intrins_feat], dim=1).clamp(min=-5e3, max=5e3)
        x = self.extra_enc(x)
        center_pred = self.fc_center(x)
        # center2lidar (ref query_generator.py:334-341), fp32 pred, f64 inv
        cp = center_pred.double()
        ci = torch.cat([cp[:, :2] * cp[:, 2:3], cp[:, 2:3]], dim=1)
        hom = torch.cat([ci, torch.ones_like(ci[:, :1])], dim=1)
        lidar2img = torch.bmm(intrinsics, extrinsics.transpose(1, 2))
        img2lidar = torch.inverse(lidar2img).float()
        center_lidar = torch.bmm(img2lidar,
                                 hom.float()[..., None])[:, :3, 0]
        return center_lidar, center_pred


def t_get_box_params(boxes_per_view, intrinsics, extrinsics):
    """ref mv2d_head.py:51-72 (float64, principal-point shift + scale)."""
    il, el = [], []
    for i, bbox in enumerate(boxes_per_view):
        K = torch.tensor(intrinsics[i], dtype=torch.float64) \
            .repeat(len(bbox), 1, 1)
        E = torch.tensor(extrinsics[i], dtype=torch.float64) \
            .repeat(len(bbox), 1, 1)
        wh_bbox = bbox[:, 2:4] - bbox[:, :2]
        scale = bbox.new_tensor([ROI, ROI])[None].double() / wh_bbox.double()
        K[:, :2, 2] = K[:, :2, 2] - bbox[:, :2].double() - 0.5 / scale
        K[:, :2] = K[:, :2] * scale[..., None]
        il.append(K)
        el.append(E)
    return torch.cat(il, 0), torch.cat(el, 0)


def t_epipolar(rois, num_per_view, lidar2img, mode):
    """ref box_correlation.py epipolar_in_box (topk_matched) on ragged rois
    [Rv, 5->(view, x1, y1, x2, y2)].  Returns per-roi matched GLOBAL roi id
    lists (incl. self first)."""
    n_samp, n_depth, d_start, d_end = 4, 8, 0.5, 70.0
    l2i = torch.tensor(lidar2img, dtype=torch.float64)
    i2l = torch.inverse(l2i)
    trans = torch.matmul(l2i[None], i2l[:, None])        # [i, j, 4, 4]

    R = rois.shape[0]
    t = torch.linspace(0, 1, n_samp)
    gy, gx = torch.meshgrid(t, t, indexing='ij')
    grid = torch.stack([gx, gy], -1).reshape(-1, 2)      # [S, 2]
    wh = rois[:, 3:5] - rois[:, 1:3]
    pts = rois[:, None, 1:3] + wh[:, None] * grid[None]  # [R, S, 2]
    S = n_samp * n_samp

    index = torch.arange(n_depth).float()
    bin_size = (d_end - d_start) / (n_depth * (1 + n_depth))
    depths = d_start + bin_size * index * (index + 1)
    uv = pts[:, :, None, :].expand(R, S, n_depth, 2).double()
    d = depths[None, None, :, None].double()
    hom = torch.cat([uv * d, d.expand(R, S, n_depth, 1),
                     torch.ones(R, S, n_depth, 1).double()], -1)
    view_of = rois[:, 0].long()
    tm = trans[view_of]                                  # [R, V, 4, 4]
    proj = torch.einsum('rvij,rsdj->rvsdi', tm, hom)[..., :3]
    depth_t = proj[..., 2]
    uv_t = (proj[..., :2] / depth_t.clamp_min(1e-2)[..., None]).float()
    ok = torch.ones_like(depth_t, dtype=torch.bool)
    ok[depth_t < d_start] = 0
    ok &= (uv_t[..., 0] >= 0) & (uv_t[..., 0] <= PAD[1] - 1) & \
          (uv_t[..., 1] >= 0) & (uv_t[..., 1] <= PAD[0] - 1)
    ok[torch.arange(R), view_of] = 0                     # exclude own view

    uv_f = uv_t.reshape(R, V, S * n_depth, 2)
    ok_f = ok.reshape(R, V, S * n_depth)
    # membership in target-view rois
    matched = [[] for _ in range(R)]
    offs = np.cumsum([0] + num_per_view)
    for r in range(R):
        matched[r].append(r)                             # self first
        for v in range(V):
            if not ok_f[r, v].any():
                continue
            p = uv_f[r, v][ok_f[r, v]]                   # [n_ok, 2]
            hull = torch.cat([p.min(0)[0], p.max(0)[0]])
            ious = []
            ids = []
            hit_any = False
            for j in range(offs[v], offs[v + 1]):
                b = rois[j, 1:5]
                inb = ((p[:, 0] >= b[0]) & (p[:, 0] <= b[2]) &
                       (p[:, 1] >= b[1]) & (p[:, 1] <= b[3])).any()
                hit_any = hit_any or bool(inb)
                xy1 = torch.maximum(hull[:2], b[:2])
                xy2 = torch.minimum(hull[2:], b[2:])
                inter = (xy2 - xy1).clamp(min=0).prod()
                area_h = (hull[2:] - hull[:2]).prod()
                area_b = (b[2:] - b[:2]).prod()
                ious.append(float(inter / (area_h + area_b - inter + 1e-4)))
                ids.append(j)
            if not hit_any:                              # epipolar_in_view
                continue
            order = np.argsort(-np.asarray(ious), kind='stable')[:TOPK]
            mx = max(ious[o] for o in order)
            for o in order:
                if ious[o] > 0 and (ious[o] > 0.0 or ious[o] > 0.0 * mx):
                    matched[r].append(ids[o])
    return matched


def t_pixel_masks(rois, matched):
    """ref gen_box_correlation (box_correlation.py:95-162): per-roi pixel
    mask [V, h, w] = union of in-box masks of the correlated rois."""
    ys = (torch.arange(FH).float() + 0.5) * STRIDE - 0.5
    xs = (torch.arange(FW).float() + 0.5) * STRIDE - 0.5
    m = (2 + 0.5) * STRIDE                               # expand_stride=2
    R = rois.shape[0]
    in_roi = torch.zeros((R, V, FH, FW), dtype=torch.bool)
    for r in range(R):
        v = int(rois[r, 0])
        b = rois[r, 1:5]
        iy = (ys + m >= b[1]) & (ys - m <= b[3])
        ix = (xs + m >= b[0]) & (xs - m <= b[2])
        in_roi[r, v] = iy[:, None] & ix[None, :]
    out = torch.zeros_like(in_roi)
    for r in range(R):
        for j in matched[r]:
            out[r] |= in_roi[j]
    return out


class TLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attentions = tnn.ModuleList([_Attn(), _Attn()])
        self.ffns = tnn.ModuleList([_FFN()])
        self.norms = tnn.ModuleList([tnn.LayerNorm(C) for _ in range(3)])

    def forward(self, q, qpos, k, kpos, cross_blocked):
        x = self.attentions[0].attn(q + qpos, q + qpos, q,
                                    need_weights=False)[0]
        q = self.norms[0](q + x)
        x = self.attentions[1].attn(q + qpos, k + kpos, k,
                                    attn_mask=cross_blocked,
                                    need_weights=False)[0]
        q = self.norms[1](q + x)
        x = self.ffns[0].layers[1](F.relu(self.ffns[0].layers[0][0](q)))
        return self.norms[2](q + x)


class _Attn(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attn = tnn.MultiheadAttention(C, HEADS, batch_first=False)


class _FFN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.layers = tnn.ModuleList(
            [tnn.Sequential(tnn.Linear(C, FF)), tnn.Linear(FF, C)])


class TBoxHead(tnn.Module):
    """ref cross_attention_head.py:199-238 (mmdet-style key tree)."""
    def __init__(self):
        super().__init__()
        self.query_embedding = tnn.Sequential(
            tnn.Linear(C * 3 // 2, C), tnn.ReLU(), tnn.Linear(C, C))
        self.transformer = tnn.Module()
        self.transformer.decoder = tnn.Module()
        self.transformer.decoder.layers = tnn.ModuleList(
            [TLayer() for _ in range(LAYERS)])
        self.transformer.decoder.post_norm = tnn.LayerNorm(C)
        self.cls_branches = tnn.ModuleList([
            tnn.Sequential(tnn.Linear(C, C), tnn.LayerNorm(C), tnn.ReLU(),
                           tnn.Linear(C, C), tnn.LayerNorm(C), tnn.ReLU(),
                           tnn.Linear(C, NUM_CLASSES))
            for _ in range(LAYERS)])
        self.reg_branches = tnn.ModuleList([
            tnn.Sequential(tnn.Linear(C, C), tnn.ReLU(),
                           tnn.Linear(C, C), tnn.ReLU(),
                           tnn.Linear(C, 10))
            for _ in range(LAYERS)])

    def forward(self, refs, keys, kpos, cross_blocked):
        """refs [Q, 3] normalized; keys/kpos [Q?, K, C] or [K, C];
        cross_blocked [Q, K] bool (True = blocked) or [Q, 1, K] for
        per-query key sets (roi mode runs queries as batch)."""
        qpos = self.query_embedding(t_pos2posemb3d(refs, C // 2))
        if keys.dim() == 2:                              # pixel mode
            q = torch.zeros_like(qpos)[:, None]
            qp = qpos[:, None]
            k = keys[:, None]
            kp = kpos[:, None]
            mask = cross_blocked
        else:                                            # roi mode: bs = Q
            q = torch.zeros_like(qpos)[None]             # [1, Q, C] seq-first
            qp = qpos[None]
            k = keys.permute(1, 0, 2)                    # [K, Q, C]
            kp = kpos.permute(1, 0, 2)
            # per-(query)batch masks -> [Q*heads, 1, K]
            mask = cross_blocked.repeat_interleave(HEADS, 0)
        outs = []
        for lyr in self.transformer.decoder.layers:
            if keys.dim() == 2:
                q = lyr(q, qp, k, kp, mask)
            else:
                # self-attn folds queries into the sequence (batch=Q):
                # FlattenMHSelfAttention (petr_transformer.py:346-351)
                qq = q.permute(1, 0, 2)                  # [Q, 1, C]
                x = lyr.attentions[0].attn(qq + qp.permute(1, 0, 2),
                                           qq + qp.permute(1, 0, 2), qq,
                                           need_weights=False)[0]
                qq = lyr.norms[0](qq + x)
                q2 = qq.permute(1, 0, 2)                 # [1, Q, C]
                x = lyr.attentions[1].attn(q2 + qp, k + kp, k,
                                           attn_mask=mask,
                                           need_weights=False)[0]
                q2 = lyr.norms[1](q2 + x)
                x = lyr.ffns[0].layers[1](
                    F.relu(lyr.ffns[0].layers[0][0](q2)))
                q = lyr.norms[2](q2 + x)
            outs.append(self.transformer.decoder.post_norm(
                q.reshape(-1, C)))
        ref = torch.log(refs.clamp(1e-5, 1 - 1e-5)
                        / (1 - refs).clamp(min=1e-5))    # inverse_sigmoid
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


def t_nms_free_decode(cls_scores, bbox_preds):
    """ref nms_free_coder.py:49-102 + gravity->bottom shift
    (cross_attention_head.py:372)."""
    scores = cls_scores.sigmoid().reshape(-1)
    k = min(MAX_NUM, scores.numel())
    top, idx = scores.topk(k)
    labels = idx % NUM_CLASSES
    code = bbox_preds[torch.div(idx, NUM_CLASSES, rounding_mode='floor')]
    rot = torch.atan2(code[:, 6:7], code[:, 7:8])
    boxes = torch.cat([code[:, 0:2], code[:, 4:5],
                       code[:, 2:4].exp(), code[:, 5:6].exp(), rot,
                       code[:, 8:10]], dim=1)
    # reorder to (x, y, z, w, l, h, rot, vx, vy)
    boxes = torch.cat([boxes[:, 0:3], boxes[:, 3:6], boxes[:, 6:]], dim=1)
    lo = torch.tensor(POS_RANGE[:3])
    hi = torch.tensor(POS_RANGE[3:])
    keep = (boxes[:, :3] >= lo).all(1) & (boxes[:, :3] <= hi).all(1)
    boxes = boxes[keep].clone()
    boxes[:, 2] -= boxes[:, 5] * 0.5                     # gravity -> bottom
    return boxes, top[keep], labels[keep]


# ============================================================== the fixture

def _np_roi_align_concat(feat_vchw, box):
    from tests.test_ops import np_roi_align
    return np_roi_align(feat_vchw.permute(1, 2, 0).numpy(), box,
                        1.0 / STRIDE, out=ROI, samp=0)


G_B = 6          # DN test: GT bucket (cfg.max_gt)
N_GT = 4         # valid GT boxes (< G_B exercises DN slot padding)
S_DN = 3         # denoise groups (cfg.denoise_scalar)
DN_SPLIT = 0.6
DN_SCALE = 1.25


def _make_gt(rng):
    """Padded GroundTruth3D bucket: N_GT valid bottom-center boxes."""
    from mv2d_tpu.models.mv2d import GroundTruth3D
    boxes = np.zeros((G_B, 9), np.float32)
    boxes[:N_GT, 0:2] = rng.uniform(-30, 30, (N_GT, 2))
    boxes[:N_GT, 2] = rng.uniform(-2.0, 0.0, N_GT)
    boxes[:N_GT, 3:6] = rng.uniform(0.8, 4.0, (N_GT, 3))
    boxes[:N_GT, 6] = rng.uniform(-3.0, 3.0, N_GT)
    boxes[:N_GT, 7:9] = rng.uniform(-2.0, 2.0, (N_GT, 2))
    labels = np.zeros(G_B, np.int32)
    labels[:N_GT] = rng.integers(0, NUM_CLASSES, N_GT)
    valid = np.arange(G_B) < N_GT
    return GroundTruth3D(boxes=jnp.asarray(boxes),
                         labels=jnp.asarray(labels),
                         valid=jnp.asarray(valid))


def _build(key_mode, use_dn=False):
    rng = np.random.default_rng(11)
    K, E = _rig()
    lidar2img = (K @ np.transpose(E, (0, 2, 1)))

    p4 = rng.normal(0, 1, (V, FH, FW, C)).astype(np.float32)
    img_shapes = np.asarray([[PAD[0], PAD[1]], [120, 176]])

    # proposal slots: 3 valid per view (one tiny <4px), 1 invalid
    boxes = np.zeros((V, P, 4), np.float32)
    boxes[0, 0] = [40, 30, 120, 100]
    boxes[0, 1] = [130, 60, 180, 110]
    boxes[0, 2] = [10, 10, 13, 40]                       # w=3 < 4: intrins off
    boxes[0, 3] = [0, 0, 50, 50]                         # invalid slot
    boxes[1, 0] = [20, 40, 90, 115]
    boxes[1, 1] = [100, 20, 170, 90]
    boxes[1, 2] = [60, 70, 100, 120]
    boxes[1, 3] = [0, 0, 40, 40]                         # invalid slot
    valid = np.ones((V, P), bool)
    valid[:, 3] = False

    torch.manual_seed(5)
    tpe = TPE()
    tqg = TQueryGenerator()
    thead = TBoxHead()
    for m in (tpe, tqg, thead):
        m.eval()
        with torch.no_grad():
            for prm in m.parameters():
                prm.copy_(torch.tensor(
                    rng.normal(0, 0.05, tuple(prm.shape)),
                    dtype=torch.float32))

    sd = {}
    sd.update({'roi_head.position_encoding.' + k: v.numpy()
               for k, v in tpe.state_dict().items()})
    sd.update({'roi_head.query_generator.' + k: v.numpy()
               for k, v in tqg.state_dict().items()})
    sd.update({'roi_head.bbox_head.' + k: v.numpy()
               for k, v in thead.state_dict().items()})
    params, _ = convert_torch_state_dict(sd)
    assert params.pop('_unmatched') == 0, params['_unmatched_keys']
    params.pop('_unmatched_keys')

    cfg = MV2DConfig(
        num_views=V, num_frames=1, image_size=PAD, depth=18,
        stage_with_dcn=(False,) * 4, num_classes=NUM_CLASSES,
        embed_dims=C, pc_range=PC_RANGE, position_range=POS_RANGE,
        roi_size=ROI, stride=STRIDE, depth_num=DEPTH_NUM, with_fpe=True,
        key_mode=key_mode, k_max=V * FH * FW,
        correlation=CorrelationConfig(topk=TOPK),
        proposal_train=DetectionProposalCfg(max_per_img=P),
        proposal_test=DetectionProposalCfg(max_per_img=P),
        num_decoder_layers=LAYERS, num_heads=HEADS,
        feedforward_channels=FF, dropout=0.0, use_denoise=use_dn,
        denoise_scalar=S_DN, denoise_noise_scale=DN_SCALE,
        denoise_noise_trans=0.0, denoise_split=DN_SPLIT, max_gt=G_B,
        max_num=MAX_NUM, max_per_scene=MAX_NUM)
    model = MV2D(cfg)
    cam = prepare_camera_params(K, E)
    proposals = Proposals(boxes=jnp.asarray(boxes),
                          scores=jnp.asarray(valid, jnp.float32),
                          labels=jnp.zeros((V, P), jnp.int32),
                          valid=jnp.asarray(valid))
    gt = _make_gt(np.random.default_rng(23)) if use_dn else None
    dn_rng = jax.random.PRNGKey(7)

    def head_fwd(mdl, p4_, cam_, shapes_):
        pos = mdl.pe(p4_, cam_.img2lidar, shapes_, mdl.cfg.image_size)
        out = mdl.roi_head_forward(p4_, pos, proposals, cam_, shapes_,
                                   gt=gt, dn_rng=dn_rng if use_dn else None)
        return pos, out

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(p4), cam,
                           jnp.asarray(img_shapes), method=head_fwd)
    # graft the converted torch weights in
    new_params = dict(variables['params'])
    for k in ('pe', 'query_generator', 'bbox_head'):
        assert k in new_params, (k, list(new_params))
        new_params[k] = params[k]
    variables = {**variables, 'params': new_params}
    pos_j, out_j = model.apply(variables, jnp.asarray(p4), cam,
                               jnp.asarray(img_shapes), method=head_fwd)

    return dict(rng=rng, K=K, E=E, lidar2img=lidar2img, p4=p4,
                img_shapes=img_shapes, boxes=boxes, valid=valid,
                tpe=tpe, tqg=tqg, thead=thead, cfg=cfg, model=model,
                variables=variables, cam=cam, proposals=proposals,
                pos_j=pos_j, out_j=out_j, gt=gt, dn_rng=dn_rng)


ERRS = {}


def _err(name, a, b):
    e = float(np.max(np.abs(np.asarray(a, np.float64)
                            - np.asarray(b, np.float64))))
    ERRS[name] = max(e, ERRS.get(name, 0.0))
    return e


def test_composed_head_pixel_mode():
    d = _build('pixel')
    boxes, valid = d['boxes'], d['valid']
    vmask = valid.reshape(-1)

    # ---- stage 1: PE
    with torch.no_grad():
        pos_t = d['tpe'](torch.tensor(d['p4']).permute(0, 3, 1, 2),
                         d['lidar2img'], d['img_shapes'])
    pos_t = pos_t.permute(0, 2, 3, 1).numpy()
    assert _err('pe', d['pos_j'], pos_t) < 2e-3

    # ---- stage 2: virtual intrinsics (valid slots)
    tb = [torch.tensor(boxes[v][valid[v]]) for v in range(V)]
    Kv_t, Ev_t = t_get_box_params(tb, d['K'], d['E'])
    Kv_j = np.asarray(virtual_intrinsics(
        jnp.asarray(boxes.reshape(-1, 4)),
        d['cam'].intrinsics[jnp.repeat(jnp.arange(V), P)], (ROI, ROI)))
    assert _err('virtual_intrinsics', Kv_j[vmask], Kv_t.numpy()) < 1e-3

    # ---- stage 3: RoIAlign(feat ++ pe), adaptive sampling oracle
    from mv2d_tpu.ops.roi_align import separable_roi_align_views
    cat_j = jnp.concatenate([jnp.asarray(d['p4']), d['pos_j']], axis=-1)
    roi_j = np.asarray(separable_roi_align_views(
        cat_j, jnp.asarray(boxes), 1.0 / STRIDE, ROI, sampling_ratio=-1,
        adaptive_max=(-(-FH // ROI), -(-FW // ROI)))).reshape(V * P, ROI,
                                                              ROI, 2 * C)
    cat_t = torch.cat([torch.tensor(d['p4']).permute(0, 3, 1, 2),
                       torch.tensor(pos_t).permute(0, 3, 1, 2)], dim=1)
    errs = []
    roi_t = np.zeros((V * P, ROI, ROI, 2 * C), np.float32)
    for r in range(V * P):
        if not vmask[r]:
            continue
        v = r // P
        roi_t[r] = _np_roi_align_concat(cat_t[v], boxes.reshape(-1, 4)[r])
        errs.append(np.abs(roi_j[r] - roi_t[r]).max())
    assert _err('roi_align', roi_j[vmask], roi_t[vmask]) < 5e-3

    # ---- stage 4: reference points (query generator)
    feat_t = torch.tensor(roi_t[vmask][..., :C]).permute(0, 3, 1, 2)
    rois5 = []
    for v in range(V):
        for b in boxes[v][valid[v]]:
            rois5.append([v, *b])
    rois5 = torch.tensor(np.asarray(rois5, np.float32))
    intr_feat = (Kv_t.reshape(-1, 16).float() * 0.1)
    wh_t = rois5[:, 3:5] - rois5[:, 1:3]
    intr_feat[(wh_t < 4).any(1)] = 0
    with torch.no_grad():
        refs_t, _ = d['tqg'](feat_t, Kv_t, Ev_t, intr_feat)
    refs_t = ((refs_t.numpy() - np.asarray(PC_RANGE[:3])) /
              (np.asarray(PC_RANGE[3:]) - np.asarray(PC_RANGE[:3]))
              ).astype(np.float32)
    # JAX side: reproduce roi_head_forward's query-gen call
    from mv2d_tpu.core.geometry import normalize_points
    qg_params = d['variables']['params']['query_generator']
    intrins_ok = jnp.asarray((boxes.reshape(-1, 4)[:, 2:4]
                              - boxes.reshape(-1, 4)[:, 0:2] >= 4.0)
                             .all(-1) & vmask)
    refs_j, _ = d['model'].apply(
        {'params': {'query_generator': qg_params}},
        jnp.asarray(roi_j[..., :C]), jnp.asarray(Kv_j),
        d['cam'].ext_t_inv[jnp.repeat(jnp.arange(V), P)], intrins_ok,
        method=lambda m, *a: m.query_generator(*a))
    refs_j = np.asarray(normalize_points(refs_j, PC_RANGE))
    assert _err('reference_points', refs_j[vmask], refs_t) < 5e-3

    # ---- stage 5: correlation pixel masks (exact boolean agreement)
    matched = t_epipolar(rois5, [int(valid[v].sum()) for v in range(V)],
                         d['lidar2img'], 'topk')
    assert any(len(m) > 1 for m in matched), 'rig must cross-correlate'
    pix_t = t_pixel_masks(rois5, matched).numpy()        # [Rv, V, FH, FW]
    from mv2d_tpu.models.correlation import (adjacency_from_correlation,
                                             epipolar_in_box,
                                             in_roi_pixel_masks,
                                             query_pixel_masks)
    corr_ids, corr_mask = epipolar_in_box(
        jnp.asarray(boxes), jnp.asarray(valid), d['cam'].trans_mats, PAD,
        d['cfg'].correlation)
    A = adjacency_from_correlation(corr_ids, corr_mask, V * P)
    in_roi = in_roi_pixel_masks(jnp.asarray(boxes), jnp.asarray(valid),
                                (FH, FW), STRIDE, 2.0)
    pix_j = np.asarray(query_pixel_masks(A, in_roi))
    pix_j = pix_j.reshape(V * P, V, FH, FW)[vmask]
    assert (pix_j == pix_t).all(), 'correlation pixel masks differ'

    # ---- stage 6: composed decoder outputs (the full JAX head forward)
    out_j = d['out_j']
    cls_j = np.asarray(out_j.all_cls_scores)[:, vmask]   # [L, Rv, 10]
    box_j = np.asarray(out_j.all_bbox_preds)[:, vmask]
    # torch oracle: ragged valid-pixel gather (view-major, row-major -
    # the same order as the JAX stable-sort key bucket)
    union = pix_t.any(0)                                 # [V, FH, FW]
    pad_t = np.ones((V, FH, FW), bool)
    for i in range(V):
        hh = int(np.floor(FH * 1.0))                     # nearest interp
        # mask at feature res (same construction as TPE)
        pass
    with torch.no_grad():
        masks = torch.ones((1, V, PAD[0], PAD[1]))
        for i in range(V):
            masks[0, i, :d['img_shapes'][i][0], :d['img_shapes'][i][1]] = 0
        pad_t = F.interpolate(masks, size=(FH, FW)).to(torch.bool)[0].numpy()
    keys_sel = union.reshape(-1)
    kidx = np.nonzero(keys_sel)[0]
    keys_t = torch.tensor(d['p4'].reshape(-1, C)[kidx])
    kpos_t = torch.tensor(pos_t.reshape(-1, C)[kidx])
    blocked = ~pix_t.reshape(-1, V * FH * FW)[:, kidx]   # [Rv, K]
    blocked |= pad_t.reshape(-1)[kidx][None]
    # no fully-masked rows for torch MHA (JAX handles them; skip such rows)
    full_rows = blocked.all(1)
    with torch.no_grad():
        cls_t, box_t = d['thead'](torch.tensor(refs_t), keys_t, kpos_t,
                                  torch.tensor(blocked))
    keep = ~full_rows
    assert keep.any()
    assert _err('decoder_cls', cls_j[:, keep], cls_t.numpy()[:, keep]) < 2e-2
    assert _err('decoder_box', box_j[:, keep], box_t.numpy()[:, keep]) < 5e-2

    # ---- stage 7: NMS-free decode end-to-end 3D boxes
    from mv2d_tpu.core.boxes import gravity_to_bottom
    from mv2d_tpu.core.coder import nms_free_decode
    bj, sj, lj, vj = nms_free_decode(
        out_j.all_cls_scores[-1], out_j.all_bbox_preds[-1],
        out_j.query_valid, MAX_NUM, NUM_CLASSES, POS_RANGE)
    bj = np.asarray(gravity_to_bottom(bj))
    sj, lj, vj = np.asarray(sj), np.asarray(lj), np.asarray(vj)
    if full_rows.any():
        # exclude decodes of fully-masked queries (absent in torch)
        qfull = np.zeros(V * P, bool)
        qfull[np.nonzero(vmask)[0][full_rows]] = True
    else:
        qfull = np.zeros(V * P, bool)
    bt, st, lt = t_nms_free_decode(cls_t[-1][keep], box_t[-1][keep])
    bt, st, lt = bt.numpy(), st.numpy(), lt.numpy()
    # set matching with tolerance (rank order may swap for near-ties)
    got = [(bj[i], sj[i], lj[i]) for i in range(MAX_NUM) if vj[i]]
    dec_err = 0.0
    n_matched = 0
    for b, s, l in zip(bt, st, lt):
        best = None
        for gb, gs, gl in got:
            if gl != l:
                continue
            e = max(np.abs(gb - b).max(), abs(float(gs) - float(s)))
            best = e if best is None else min(best, e)
        if best is not None and best < 5e-2:
            n_matched += 1
            dec_err = max(dec_err, best)
    ERRS['decoded_boxes'] = dec_err
    assert n_matched >= min(len(bt), len(got)) * 0.9, \
        f'only {n_matched}/{len(bt)} decoded boxes matched'


def test_composed_head_roi_mode():
    """MV2D-S head, non-DN eval: keys = the correlated rois' 7x7 RoI
    features (ref mv2d_s_head.py:184-192)."""
    d = _build('roi')
    boxes, valid = d['boxes'], d['valid']
    vmask = valid.reshape(-1)

    with torch.no_grad():
        pos_t = d['tpe'](torch.tensor(d['p4']).permute(0, 3, 1, 2),
                         d['lidar2img'], d['img_shapes'])
    pos_t = pos_t.permute(0, 2, 3, 1).numpy()
    cat_t = torch.cat([torch.tensor(d['p4']).permute(0, 3, 1, 2),
                       torch.tensor(pos_t).permute(0, 3, 1, 2)], dim=1)
    roi_t = np.zeros((V * P, ROI, ROI, 2 * C), np.float32)
    for r in range(V * P):
        if vmask[r]:
            roi_t[r] = _np_roi_align_concat(cat_t[r // P],
                                            boxes.reshape(-1, 4)[r])
    tb = [torch.tensor(boxes[v][valid[v]]) for v in range(V)]
    Kv_t, Ev_t = t_get_box_params(tb, d['K'], d['E'])
    rois5 = []
    for v in range(V):
        for b in boxes[v][valid[v]]:
            rois5.append([v, *b])
    rois5 = torch.tensor(np.asarray(rois5, np.float32))
    intr_feat = Kv_t.reshape(-1, 16).float() * 0.1
    wh_t = rois5[:, 3:5] - rois5[:, 1:3]
    intr_feat[(wh_t < 4).any(1)] = 0
    with torch.no_grad():
        refs_t, _ = d['tqg'](
            torch.tensor(roi_t[vmask][..., :C]).permute(0, 3, 1, 2),
            Kv_t, Ev_t, intr_feat)
    refs_t = ((refs_t.numpy() - np.asarray(PC_RANGE[:3])) /
              (np.asarray(PC_RANGE[3:]) - np.asarray(PC_RANGE[:3]))
              ).astype(np.float32)

    # keys: correlated rois' features; mask valid corr slots
    matched = t_epipolar(rois5, [int(valid[v].sum()) for v in range(V)],
                         d['lidar2img'], 'topk')
    Rv = int(vmask.sum())
    area = ROI * ROI
    max_c = max(len(m) for m in matched)
    feats_valid = roi_t[vmask]
    keys_t = torch.zeros((Rv, max_c * area, C))
    kpos_t = torch.zeros((Rv, max_c * area, C))
    blocked = torch.ones((Rv, 1, max_c * area), dtype=torch.bool)
    for r, m in enumerate(matched):
        for ci, j in enumerate(m):
            keys_t[r, ci * area:(ci + 1) * area] = torch.tensor(
                feats_valid[j][..., :C].reshape(area, C))
            kpos_t[r, ci * area:(ci + 1) * area] = torch.tensor(
                feats_valid[j][..., C:].reshape(area, C))
            blocked[r, 0, ci * area:(ci + 1) * area] = False
    with torch.no_grad():
        cls_t, box_t = d['thead'](torch.tensor(refs_t), keys_t, kpos_t,
                                  blocked)

    out_j = d['out_j']
    cls_j = np.asarray(out_j.all_cls_scores)[:, vmask]
    box_j = np.asarray(out_j.all_bbox_preds)[:, vmask]
    assert _err('roi_mode_cls', cls_j, cls_t.numpy()) < 2e-2
    assert _err('roi_mode_box', box_j, box_t.numpy()) < 5e-2


def t_prepare_for_dn(gt_boxes9, gt_labels, rand, rnum):
    """ref prepare_for_dn (mv2d_s_head.py:39-120) with the noise draw
    INJECTED (rand [S_DN*N_GT, 3] in (-1, 1), group-major) so the torch
    oracle and the JAX `_prepare_dn` apply identical noise.  Returns
    (noisy centers [pad, 3] in [0,1], known_labels [pad], known_bboxs
    [pad, 9] gravity, attn_mask [pad+rnum, pad+rnum] True=blocked)."""
    gravity = gt_boxes9.clone()
    gravity[:, 2] = gravity[:, 2] + gt_boxes9[:, 5] / 2
    known_labels = gt_labels.repeat(S_DN).long()
    known_bboxs = gravity.repeat(S_DN, 1)
    center = known_bboxs[:, :3].clone()
    scale = known_bboxs[:, 3:6].clone()
    diff = scale / 2 + 0.0                       # denoise_noise_trans = 0
    center = center + rand * diff * DN_SCALE
    pr = PC_RANGE
    for a in range(3):
        center[:, a] = (center[:, a] - pr[a]) / (pr[3 + a] - pr[a])
    eps = 1e-4
    center = center.clamp(min=eps, max=1 - eps)
    neg = rand.norm(2, dim=1) > DN_SPLIT
    known_labels[neg] = NUM_CLASSES
    single_pad = gt_boxes9.shape[0]
    pad = single_pad * S_DN
    tgt = pad + rnum
    m = torch.zeros(tgt, tgt, dtype=torch.bool)
    m[pad:, :pad] = True                          # match cannot see DN
    for i in range(S_DN):                         # DN groups are blinded
        if i == S_DN - 1:
            m[single_pad * i:single_pad * (i + 1), :single_pad * i] = True
        else:
            m[single_pad * i:single_pad * (i + 1),
              single_pad * (i + 1):pad] = True
            m[single_pad * i:single_pad * (i + 1), :single_pad * i] = True
    return center, known_labels, known_bboxs, m


def t_normalize_bbox(b):
    """ref core/bbox/util.py:38-58 (gravity 9-dim -> 10-dim code)."""
    return torch.cat([b[:, 0:2], b[:, 3:4].log(), b[:, 4:5].log(),
                      b[:, 2:3], b[:, 5:6].log(),
                      b[:, 6:7].sin(), b[:, 6:7].cos(), b[:, 7:9]], dim=1)


def t_dn_loss_single(cls_scores, bbox_preds, known_bboxs, known_labels,
                     num_tgt):
    """ref dn_loss_single (cross_attention_head.py:476-538),
    neg_bbox_loss=True (MV2D-T recipe ..._ep24.py:45), single GPU
    (reduce_mean = identity)."""
    cls_avg = max(num_tgt * 3.14159 / 6 * DN_SPLIT ** 3, 1.0)
    t = F.one_hot(known_labels.clamp(max=NUM_CLASSES),
                  NUM_CLASSES + 1)[:, :NUM_CLASSES].float()
    p = cls_scores.sigmoid()
    pt = (1 - p) * t + p * (1 - t)
    fw = (0.25 * t + 0.75 * (1 - t)) * pt.pow(2.0)
    ce = F.binary_cross_entropy_with_logits(cls_scores, t,
                                            reduction='none')
    loss_cls = (ce * fw).sum() / cls_avg * 2.0

    targets = t_normalize_bbox(known_bboxs)
    cw = torch.tensor([1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.5, 1.5, 2.0, 2.0])
    w = torch.ones_like(bbox_preds) * cw
    w[:, 6:8] = 0                                 # ref :531 yaw zeroing
    isnotnan = torch.isfinite(targets).all(dim=-1)
    loss_bbox = ((bbox_preds[isnotnan] - targets[isnotnan]).abs()
                 * w[isnotnan]).sum() / max(num_tgt, 1.0) * 0.25
    return float(loss_cls), float(loss_bbox)


def test_composed_head_roi_dn_mode():
    """MV2D-S head TRAINING path with DN: prepare_for_dn noise/labels,
    the DN self-attn block mask, the DN-mode decoder (keys = ALL rois'
    7x7 features, scatter-built cross mask) and dn_loss_single, against
    the JAX train path under a shared noise draw (ref mv2d_s_head.py:
    39-120, 158-180; cross_attention_head.py:476-538)."""
    d = _build('roi', use_dn=True)
    boxes, valid, cfg = d['boxes'], d['valid'], d['cfg']
    vmask = valid.reshape(-1)
    Rv = int(vmask.sum())
    area = ROI * ROI

    # ---- shared noise draw: exactly what _prepare_dn consumed
    rand_j = np.asarray(jax.random.uniform(d['dn_rng'], (S_DN * G_B, 3),
                                           minval=-1.0, maxval=1.0))
    rand_valid = rand_j.reshape(S_DN, G_B, 3)[:, :N_GT].reshape(-1, 3)

    gt = d['gt']
    gt_boxes_t = torch.tensor(np.asarray(gt.boxes)[:N_GT])
    gt_labels_t = torch.tensor(np.asarray(gt.labels)[:N_GT])
    refs_dn_t, known_labels_t, known_bboxs_t, self_blocked = \
        t_prepare_for_dn(gt_boxes_t, gt_labels_t,
                         torch.tensor(rand_valid), Rv)

    # ---- JAX DN prep vs oracle (valid slots; jax slot s*G_B+g)
    noisy_j, dn_info = d['model']._prepare_dn(gt, d['dn_rng'])
    dn_valid = np.asarray(dn_info.valid)
    sl_j = (np.arange(S_DN)[:, None] * G_B + np.arange(N_GT)).reshape(-1)
    assert dn_valid[sl_j].all() and dn_valid.sum() == len(sl_j)
    assert _err('dn_refs', np.asarray(noisy_j)[sl_j],
                refs_dn_t.numpy()) < 1e-5
    assert (np.asarray(dn_info.known_labels)[sl_j]
            == known_labels_t.numpy()).all()
    assert _err('dn_known_boxes', np.asarray(dn_info.known_boxes)[sl_j],
                known_bboxs_t.numpy()) < 1e-5

    # ---- self-attn mask vs oracle on the valid-slot submatrix
    allowed_j = np.asarray(d['model']._dn_self_mask(
        jnp.asarray(vmask), dn_info.valid))
    rows = np.concatenate([sl_j, cfg.dn_pad + np.where(vmask)[0]])
    assert (allowed_j[np.ix_(rows, rows)]
            == ~self_blocked.numpy()).all()

    # ---- torch stage chain (as the roi-mode test) for refs and RoI feats
    with torch.no_grad():
        pos_t = d['tpe'](torch.tensor(d['p4']).permute(0, 3, 1, 2),
                         d['lidar2img'], d['img_shapes'])
    pos_t = pos_t.permute(0, 2, 3, 1).numpy()
    cat_t = torch.cat([torch.tensor(d['p4']).permute(0, 3, 1, 2),
                       torch.tensor(pos_t).permute(0, 3, 1, 2)], dim=1)
    roi_t = np.zeros((V * P, ROI, ROI, 2 * C), np.float32)
    for r in range(V * P):
        if vmask[r]:
            roi_t[r] = _np_roi_align_concat(cat_t[r // P],
                                            boxes.reshape(-1, 4)[r])
    tb = [torch.tensor(boxes[v][valid[v]]) for v in range(V)]
    Kv_t, Ev_t = t_get_box_params(tb, d['K'], d['E'])
    rois5 = []
    for v in range(V):
        for b in boxes[v][valid[v]]:
            rois5.append([v, *b])
    rois5 = torch.tensor(np.asarray(rois5, np.float32))
    intr_feat = Kv_t.reshape(-1, 16).float() * 0.1
    wh_t = rois5[:, 3:5] - rois5[:, 1:3]
    intr_feat[(wh_t < 4).any(1)] = 0
    with torch.no_grad():
        refs_t, _ = d['tqg'](
            torch.tensor(roi_t[vmask][..., :C]).permute(0, 3, 1, 2),
            Kv_t, Ev_t, intr_feat)
    refs_t = torch.tensor(
        ((refs_t.numpy() - np.asarray(PC_RANGE[:3])) /
         (np.asarray(PC_RANGE[3:]) - np.asarray(PC_RANGE[:3]))
         ).astype(np.float32))

    # ---- DN-mode decoder: keys = ALL (valid) rois' features; real query
    # r sees its correlated rois' pixels, DN rows see every roi
    # (ref mv2d_s_head.py:158-180)
    matched = t_epipolar(rois5, [int(valid[v].sum()) for v in range(V)],
                         d['lidar2img'], 'topk')
    feats_valid = roi_t[vmask]
    keys_t = torch.tensor(feats_valid[..., :C].reshape(Rv * area, C))
    kpos_t = torch.tensor(feats_valid[..., C:].reshape(Rv * area, C))
    pad = S_DN * N_GT
    Qt = pad + Rv
    cross_blocked = torch.ones((Qt, Rv * area), dtype=torch.bool)
    cross_blocked[:pad] = False
    for r, m in enumerate(matched):
        for j in m:
            cross_blocked[pad + r, j * area:(j + 1) * area] = False
    refs_all_t = torch.cat([refs_dn_t.float(), refs_t], dim=0)

    thead = d['thead']
    with torch.no_grad():
        qpos = thead.query_embedding(t_pos2posemb3d(refs_all_t, C // 2))
        q = torch.zeros_like(qpos)[:, None]
        qp = qpos[:, None]
        k = keys_t[:, None]
        kp = kpos_t[:, None]
        outs = []
        for lyr in thead.transformer.decoder.layers:
            x = lyr.attentions[0].attn(q + qp, q + qp, q,
                                       attn_mask=self_blocked,
                                       need_weights=False)[0]
            q = lyr.norms[0](q + x)
            x = lyr.attentions[1].attn(q + qp, k + kp, k,
                                       attn_mask=cross_blocked,
                                       need_weights=False)[0]
            q = lyr.norms[1](q + x)
            x = lyr.ffns[0].layers[1](F.relu(lyr.ffns[0].layers[0][0](q)))
            q = lyr.norms[2](q + x)
            outs.append(thead.transformer.decoder.post_norm(
                q.reshape(-1, C)))
        ref = torch.log(refs_all_t.clamp(1e-5, 1 - 1e-5)
                        / (1 - refs_all_t).clamp(min=1e-5))
        cls_t, box_t = [], []
        for lvl, out in enumerate(outs):
            cls = thead.cls_branches[lvl](out)
            reg = thead.reg_branches[lvl](out)
            xy = torch.sigmoid(reg[:, 0:2] + ref[:, 0:2])
            z = torch.sigmoid(reg[:, 4:5] + ref[:, 2:3])
            pr = PC_RANGE
            xy = xy * torch.tensor([pr[3] - pr[0], pr[4] - pr[1]]) + \
                torch.tensor([pr[0], pr[1]])
            z = z * (pr[5] - pr[2]) + pr[2]
            box = torch.cat([xy, reg[:, 2:4], z, reg[:, 5:]], dim=1)
            cls_t.append(cls)
            box_t.append(box)
        cls_t = torch.stack(cls_t)
        box_t = torch.stack(box_t)

    # ---- per-layer outputs: DN slots + match slots
    out_j = d['out_j']
    dn_cls_j = np.asarray(out_j.dn_cls_scores)[:, sl_j]
    dn_box_j = np.asarray(out_j.dn_bbox_preds)[:, sl_j]
    assert _err('dn_mode_dn_cls', dn_cls_j, cls_t[:, :pad].numpy()) < 2e-2
    assert _err('dn_mode_dn_box', dn_box_j, box_t[:, :pad].numpy()) < 5e-2
    cls_j = np.asarray(out_j.all_cls_scores)[:, vmask]
    box_j = np.asarray(out_j.all_bbox_preds)[:, vmask]
    assert _err('dn_mode_cls', cls_j, cls_t[:, pad:].numpy()) < 2e-2
    assert _err('dn_mode_box', box_j, box_t[:, pad:].numpy()) < 5e-2

    # ---- dn_loss_single per layer: torch oracle on the JAX OUTPUTS (so
    # the loss comparison isolates loss semantics from decoder fp drift)
    from mv2d_tpu.train.losses import dn_layer_loss
    num_tgt = S_DN * N_GT
    for lvl in range(LAYERS):
        lj = dn_layer_loss(out_j.dn_cls_scores[lvl],
                           out_j.dn_bbox_preds[lvl], dn_info, cfg)
        lt_cls, lt_bbox = t_dn_loss_single(
            torch.tensor(dn_cls_j[lvl]), torch.tensor(dn_box_j[lvl]),
            known_bboxs_t.float(), known_labels_t, num_tgt)
        assert _err(f'dn_loss_cls_l{lvl}', float(lj.loss_cls),
                    lt_cls) < 1e-4
        assert _err(f'dn_loss_bbox_l{lvl}', float(lj.loss_bbox),
                    lt_bbox) < 1e-4


def teardown_module(module):
    if ERRS:
        rows = '\n'.join(f'  {k:<22} {v:.3e}' for k, v in ERRS.items())
        print(f'\n[composed 3D-head golden] per-stage max abs err:\n{rows}')
