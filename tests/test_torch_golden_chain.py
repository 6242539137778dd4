"""Module-level torch golden tests for the full 2D detector chain.

mmdet is not installable here, so the oracle is an INDEPENDENT torch
transcription of the mmdet modules the reference configures
(configs/mv2d/detectors/maskrcnn_r50.py): pytorch-style ResNet-50
(frozen BN), FPN with nearest top-down + stride-2 max-pool p6, RPN head
with per-level top-k / delta decode / per-LEVEL NMS
(RPNHead._get_bboxes_single semantics), SingleRoIExtractor level routing,
Shared2FC R-CNN head, class-specific delta decode and class-agnostic
multiclass NMS (the detection_proposal config, ..._ep24.py:128-133).

One fixed random-weight model is built in torch, its state dict converted
through train/checkpoint.convert_torch_state_dict (so the converter is
under test too), and the SAME image is run through both chains:

  torch backbone == jax backbone  ->  FPN  ->  RPN proposal SET
  ->  R-CNN detections (boxes, scores, labels)

torch conv/pool/interpolate are independent implementations vs XLA, so
this catches padding/stride/layout/NMS-semantics bugs the pure-jax unit
tests cannot.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn                                  # noqa: E402
import torch.nn.functional as F                         # noqa: E402

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402

from mv2d_tpu.models.detector2d import (DetectionProposalCfg,  # noqa: E402
                                        TwoStageDetector)
from mv2d_tpu.train.checkpoint import convert_torch_state_dict  # noqa: E402

NUM_CLASSES = 10
IMG = (96, 128)          # (H, W)
STRIDES = (4, 8, 16, 32, 64)
SCALES = (8,)
RATIOS = (0.5, 1.0, 2.0)


# ------------------------------------------------------------ torch model

class TBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, has_ds=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = tnn.Sequential(
            tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4)) if has_ds else None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idt)


class TResNet(tnn.Module):
    def __init__(self, blocks=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        inplanes, planes = 64, 64
        for s, n in enumerate(blocks):
            stride = 1 if s == 0 else 2
            layers = [TBottleneck(inplanes, planes, stride, has_ds=True)]
            inplanes = planes * 4
            layers += [TBottleneck(inplanes, planes) for _ in range(n - 1)]
            setattr(self, f'layer{s + 1}', tnn.Sequential(*layers))
            planes *= 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for s in range(4):
            x = getattr(self, f'layer{s + 1}')(x)
            outs.append(x)
        return outs


class TConvModule(tnn.Module):     # mmcv ConvModule (no norm/act) naming
    def __init__(self, cin, cout, k, p=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, padding=p)

    def forward(self, x):
        return self.conv(x)


class TFPN(tnn.Module):
    def __init__(self, in_chs=(256, 512, 1024, 2048), out_ch=256):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [TConvModule(c, out_ch, 1) for c in in_chs])
        self.fpn_convs = tnn.ModuleList(
            [TConvModule(out_ch, out_ch, 3, p=1) for _ in in_chs])

    def forward(self, feats):
        lat = [m(f) for m, f in zip(self.lateral_convs, feats)]
        for i in range(len(lat) - 1, 0, -1):
            lat[i - 1] = lat[i - 1] + F.interpolate(
                lat[i], size=lat[i - 1].shape[2:], mode='nearest')
        outs = [m(x) for m, x in zip(self.fpn_convs, lat)]
        outs.append(F.max_pool2d(outs[-1], 1, stride=2))   # p6
        return outs


class TRPNHead(tnn.Module):
    def __init__(self, ch=256, A=3):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(ch, ch, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(ch, A, 1)
        self.rpn_reg = tnn.Conv2d(ch, A * 4, 1)

    def forward(self, feats):
        scores, deltas = [], []
        for f in feats:
            x = F.relu(self.rpn_conv(f))
            scores.append(self.rpn_cls(x))
            deltas.append(self.rpn_reg(x))
        return scores, deltas


class TBBoxHead(tnn.Module):       # mmdet Shared2FCBBoxHead naming
    def __init__(self, ch=256, fc=1024, num_classes=NUM_CLASSES):
        super().__init__()
        self.shared_fcs = tnn.ModuleList(
            [tnn.Linear(ch * 49, fc), tnn.Linear(fc, fc)])
        self.fc_cls = tnn.Linear(fc, num_classes + 1)
        self.fc_reg = tnn.Linear(fc, num_classes * 4)

    def forward(self, x):
        x = x.flatten(1)
        for fcm in self.shared_fcs:
            x = F.relu(fcm(x))
        return self.fc_cls(x), self.fc_reg(x)


class TRoIHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.bbox_head = TBBoxHead()


class TDetector(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TResNet()
        self.neck = TFPN()
        self.rpn_head = TRPNHead()
        self.roi_head = TRoIHead()


def randomize(model, rng):
    """Random weights + random frozen-BN stats (exercises the BN fold)."""
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.Conv2d, tnn.Linear)):
                m.weight.copy_(torch.tensor(
                    rng.normal(0, 0.05, m.weight.shape), dtype=torch.float32))
                if m.bias is not None:
                    m.bias.copy_(torch.tensor(
                        rng.normal(0, 0.02, m.bias.shape),
                        dtype=torch.float32))
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.copy_(torch.tensor(
                    rng.uniform(0.5, 1.5, m.weight.shape),
                    dtype=torch.float32))
                m.bias.copy_(torch.tensor(
                    rng.normal(0, 0.1, m.bias.shape), dtype=torch.float32))
                m.running_mean.copy_(torch.tensor(
                    rng.normal(0, 0.1, m.running_mean.shape),
                    dtype=torch.float32))
                m.running_var.copy_(torch.tensor(
                    rng.uniform(0.5, 1.5, m.running_var.shape),
                    dtype=torch.float32))
    with torch.no_grad():
        # keep decoded boxes on-image: raw N(0, 0.05) reg weights put
        # every proposal off the 96x128 canvas (dx*pw ~ 80 px)
        model.rpn_head.rpn_reg.weight.mul_(0.02)
        model.rpn_head.rpn_reg.bias.mul_(0.0)
        model.roi_head.bbox_head.fc_reg.weight.mul_(0.05)
        model.roi_head.bbox_head.fc_reg.bias.mul_(0.0)
    model.eval()
    return model


# -------------------------------------------------- numpy oracle helpers

def o_base_anchors(stride):
    """mmdet AnchorGenerator.gen_single_level_base_anchors
    (center_offset=0): w = base/sqrt(r)*s, h = base*sqrt(r)*s."""
    out = []
    for r in RATIOS:
        for s in SCALES:
            h = stride * np.sqrt(r) * s
            w = stride / np.sqrt(r) * s
            out.append([-0.5 * w, -0.5 * h, 0.5 * w, 0.5 * h])
    return np.asarray(out, np.float64)


def o_grid_anchors(hw, stride):
    H, W = hw
    base = o_base_anchors(stride)
    sx = np.arange(W) * stride
    sy = np.arange(H) * stride
    mx, my = np.meshgrid(sx, sy)
    shifts = np.stack([mx, my, mx, my], -1).reshape(-1, 4)
    return (shifts[:, None] + base[None]).reshape(-1, 4)


def o_delta2bbox(anchors, deltas, max_shape, stds=(1., 1., 1., 1.)):
    d = deltas * np.asarray(stds)
    max_ratio = abs(np.log(16.0 / 1000.0))
    dw = np.clip(d[:, 2], -max_ratio, max_ratio)
    dh = np.clip(d[:, 3], -max_ratio, max_ratio)
    pw = anchors[:, 2] - anchors[:, 0]
    ph = anchors[:, 3] - anchors[:, 1]
    px = (anchors[:, 0] + anchors[:, 2]) / 2
    py = (anchors[:, 1] + anchors[:, 3]) / 2
    gw, gh = pw * np.exp(dw), ph * np.exp(dh)
    gx, gy = px + pw * d[:, 0], py + ph * d[:, 1]
    x1, y1 = gx - gw / 2, gy - gh / 2
    x2, y2 = gx + gw / 2, gy + gh / 2
    h, w = max_shape
    return np.stack([np.clip(x1, 0, w), np.clip(y1, 0, h),
                     np.clip(x2, 0, w), np.clip(y2, 0, h)], -1)


def o_nms(boxes, scores, thr):
    """Greedy NMS, keeps IoU <= thr (mmcv nms semantics).  Returns kept
    indices in descending-score order."""
    order = np.argsort(-scores, kind='stable')
    keep, suppressed = [], np.zeros(len(boxes), bool)
    area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        np.maximum(boxes[:, 3] - boxes[:, 1], 0)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        iou = inter / np.maximum(area[i] + area - inter, 1e-12)
        suppressed |= iou > thr
    return np.asarray(keep, np.int64)


def o_rpn_proposals(scores, deltas, cfg):
    """mmdet RPNHead._get_bboxes_single: per-level sigmoid top-k, decode,
    clip, per-LEVEL batched NMS, global top max_per_img."""
    all_b, all_s, all_l = [], [], []
    for lv, (s, d) in enumerate(zip(scores, deltas)):
        s = torch.sigmoid(s).permute(0, 2, 3, 1).reshape(-1).numpy()
        dd = d.permute(0, 2, 3, 1).reshape(-1, 4).numpy().astype(np.float64)
        H, W = scores[lv].shape[2], scores[lv].shape[3]
        anchors = o_grid_anchors((H, W), STRIDES[lv])
        n_pre = min(cfg.rpn_nms_pre, len(s))
        idx = np.argsort(-s, kind='stable')[:n_pre]
        all_b.append(o_delta2bbox(anchors[idx], dd[idx], IMG))
        all_s.append(s[idx])
        all_l.append(np.full(n_pre, lv))
    b = np.concatenate(all_b)
    s = np.concatenate(all_s)
    lv = np.concatenate(all_l)
    # mmdet filters w > min_bbox_size & h > min_bbox_size (STRICT, so
    # min_bbox_size=0 still drops clip-degenerate boxes)
    wh = b[:, 2:4] - b[:, 0:2]
    ok = (wh > 0).all(-1)
    b, s, lv = b[ok], s[ok], lv[ok]
    # batched_nms with level ids = per-id coordinate offset
    off = lv[:, None] * (b.max() + 1.0)
    keep = o_nms(b + off, s, cfg.rpn_iou_threshold)[:cfg.rpn_max_per_img]
    return b[keep], s[keep]


def o_roi_levels(boxes, num_levels=4, finest=56.0):
    scale = np.sqrt(np.maximum(boxes[:, 2] - boxes[:, 0], 0) *
                    np.maximum(boxes[:, 3] - boxes[:, 1], 0))
    lvl = np.floor(np.log2(scale / finest + 1e-6))
    return np.clip(lvl, 0, num_levels - 1).astype(np.int64)


def o_rcnn(fpn_feats, proposals, bbox_head, cfg):
    """RoIAlign (numpy oracle) -> Shared2FC -> class-specific decode ->
    class-agnostic multiclass NMS (detection_proposal config)."""
    from tests.test_ops import np_roi_align
    lvls = o_roi_levels(proposals)
    roi_feats = []
    for r, box in enumerate(proposals):
        lv = lvls[r]
        feat = fpn_feats[lv][0].permute(1, 2, 0).numpy()    # [H, W, C]
        # samp=0 = mmcv adaptive ceil(bin), the reference extractor setting
        # (maskrcnn_r50.py:40 sampling_ratio=0)
        roi_feats.append(np_roi_align(feat, box, 1.0 / STRIDES[lv], samp=0))
    roi_feats = torch.tensor(np.asarray(roi_feats), dtype=torch.float32)
    # torch flatten order is CHW; the jax head flattens HWC - feed CHW
    with torch.no_grad():
        cls_logits, reg = bbox_head(roi_feats.permute(0, 3, 1, 2))
    scores = torch.softmax(cls_logits, -1).numpy()[:, :NUM_CLASSES]
    reg = reg.numpy().astype(np.float64).reshape(-1, NUM_CLASSES, 4)
    boxes = np.stack([
        o_delta2bbox(proposals, reg[:, c], IMG, stds=(0.1, 0.1, 0.2, 0.2))
        for c in range(NUM_CLASSES)], axis=1)               # [R, C, 4]
    # multiclass flatten + score_thr + min size + class-agnostic NMS
    fb = boxes.reshape(-1, 4)
    fs = scores.reshape(-1)
    fl = np.tile(np.arange(NUM_CLASSES), len(proposals))
    ok = fs > cfg.score_thr
    wh = fb[:, 2:4] - fb[:, 0:2]
    ok &= (wh >= cfg.min_bbox_size).all(-1)
    fb, fs, fl = fb[ok], fs[ok], fl[ok]
    n_pre = min(cfg.nms_pre, len(fs))
    idx = np.argsort(-fs, kind='stable')[:n_pre]
    fb, fs, fl = fb[idx], fs[idx], fl[idx]
    keep = o_nms(fb, fs, cfg.iou_threshold)[:cfg.max_per_img]
    return fb[keep], fs[keep], fl[keep]


def assert_same_detection_set(got_b, got_s, want_b, want_s,
                              got_l=None, want_l=None,
                              atol_box=0.1, atol_s=3e-4):
    """Order-insensitive set match: every wanted detection has exactly one
    got detection with the same box/score(/label).  Near-tied scores may
    legally reorder between f32 and f64 pipelines."""
    assert len(got_b) == len(want_b), (len(got_b), len(want_b))
    used = np.zeros(len(want_b), bool)
    for i, (gb, gs) in enumerate(zip(got_b, got_s)):
        cand = (~used & (np.abs(want_s - gs) < atol_s) &
                (np.abs(want_b - gb).max(-1) < atol_box))
        if got_l is not None:
            cand &= want_l == got_l[i]
        assert cand.any(), (i, gb, gs)
        used[int(np.argmax(cand))] = True
    assert used.all()


# ------------------------------------------------------------------ test

@pytest.fixture(scope='module')
def chain():
    rng = np.random.default_rng(42)
    tmodel = randomize(TDetector(), rng)
    sd = {'base_detector.' + k: v.numpy()
          for k, v in tmodel.state_dict().items()}
    params, constants = convert_torch_state_dict(sd)
    assert params.pop('_unmatched') == 0, params['_unmatched_keys']
    params.pop('_unmatched_keys')
    jmodel = TwoStageDetector(depth=50)
    img = rng.normal(0, 1, (1, *IMG, 3)).astype(np.float32)
    variables = {'params': params['base_detector'],
                 'constants': constants['base_detector']}
    timg = torch.tensor(np.transpose(img, (0, 3, 1, 2)))
    return tmodel, jmodel, variables, img, timg


def test_backbone_and_fpn_match_torch(chain):
    tmodel, jmodel, variables, img, timg = chain
    with torch.no_grad():
        tfpn = tmodel.neck(tmodel.backbone(timg))
    jfpn = jmodel.apply(variables, jnp.asarray(img),
                        method=TwoStageDetector.extract_feat)
    assert len(jfpn) == 5
    for lv in range(5):
        want = tfpn[lv].permute(0, 2, 3, 1).numpy()
        got = np.asarray(jfpn[lv])
        err = np.abs(got - want).max()
        scale = np.abs(want).max() + 1e-6
        assert err / scale < 2e-4, (lv, err, scale)


def test_rpn_proposals_match_torch(chain):
    tmodel, jmodel, variables, img, timg = chain
    cfg = DetectionProposalCfg(rpn_nms_pre=200, rpn_max_per_img=100)
    with torch.no_grad():
        tfpn = tmodel.neck(tmodel.backbone(timg))
        tscores, tdeltas = tmodel.rpn_head(tfpn)
    want_b, want_s = o_rpn_proposals(tscores, tdeltas, cfg)

    jfpn = jmodel.apply(variables, jnp.asarray(img),
                        method=TwoStageDetector.extract_feat)
    got_b, got_s, got_v = jmodel.apply(
        variables, jfpn, IMG, cfg, method=TwoStageDetector.rpn)
    got_b = np.asarray(got_b[0])[np.asarray(got_v[0])]
    got_s = np.asarray(got_s[0])[np.asarray(got_v[0])]
    assert_same_detection_set(got_b, got_s, want_b, want_s)


def test_rcnn_detections_match_torch(chain):
    tmodel, jmodel, variables, img, timg = chain
    cfg = DetectionProposalCfg(score_thr=0.05, nms_pre=200, max_per_img=20,
                               iou_threshold=0.6, min_bbox_size=8.0,
                               rpn_nms_pre=200, rpn_max_per_img=100)
    with torch.no_grad():
        tfpn = tmodel.neck(tmodel.backbone(timg))
        tscores, tdeltas = tmodel.rpn_head(tfpn)
    prop_b, _ = o_rpn_proposals(tscores, tdeltas, cfg)
    want_b, want_s, want_l = o_rcnn(tfpn, prop_b, tmodel.roi_head.bbox_head,
                                    cfg)

    jfpn = jmodel.apply(variables, jnp.asarray(img),
                        method=TwoStageDetector.extract_feat)
    props = jmodel.apply(variables, jfpn, IMG, cfg,
                         method=TwoStageDetector.detect)
    v = np.asarray(props.valid[0])
    got_b = np.asarray(props.boxes[0])[v]
    got_s = np.asarray(props.scores[0])[v]
    got_l = np.asarray(props.labels[0])[v]
    assert_same_detection_set(got_b, got_s, want_b, want_s, got_l, want_l)
