import jax
import jax.numpy as jnp
import numpy as np

from mv2d_tpu.nn.decoder import CrossAttentionBoxHead
from mv2d_tpu.nn.fpn import FPN
from mv2d_tpu.nn.pe import PE, padding_mask_at_feature_res, pos2posemb3d
from mv2d_tpu.nn.query_generator import QueryGenerator
from mv2d_tpu.nn.rcnn import Shared2FCBBoxHead, decode_detections
from mv2d_tpu.nn.resnet import ResNet
from mv2d_tpu.nn.rpn import (RPNHead, bbox2delta, delta2bbox, grid_anchors,
                             rpn_proposals)

KEY = jax.random.PRNGKey(0)


def test_resnet50_stage_shapes(rng):
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)), dtype=jnp.float32)
    model = ResNet(depth=50)
    params = model.init(KEY, x)
    outs = model.apply(params, x)
    shapes = [o.shape for o in outs]
    assert shapes == [(1, 16, 24, 256), (1, 8, 12, 512),
                      (1, 4, 6, 1024), (1, 2, 3, 2048)]


def test_fpn_five_levels(rng):
    ins = [jnp.asarray(rng.normal(size=(1, 2 ** (4 - i), 3 * 2 ** (4 - i), c)),
                       dtype=jnp.float32)
           for i, c in enumerate([256, 512, 1024, 2048])]
    fpn = FPN(out_channels=64, num_outs=5)
    params = fpn.init(KEY, ins)
    outs = fpn.apply(params, ins)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 48, 64)
    assert outs[4].shape == (1, 1, 3, 64)


def test_neck_fpn_selects_p4(rng):
    ins = [jnp.asarray(rng.normal(size=(1, 2 ** (5 - i), 2 ** (5 - i), 8)),
                       dtype=jnp.float32) for i in range(5)]
    neck = FPN(out_channels=8, num_outs=1, start_level=2, end_level=2)
    params = neck.init(KEY, ins)
    outs = neck.apply(params, ins)
    assert len(outs) == 1 and outs[0].shape == (1, 8, 8, 8)


def test_delta_coding_roundtrip(rng):
    anchors = jnp.asarray(rng.uniform(0, 100, (10, 2)))
    anchors = jnp.concatenate([anchors, anchors + rng.uniform(5, 30, (10, 2))],
                              -1).astype(jnp.float32)
    gt = anchors + 3.0
    d = bbox2delta(anchors, gt)
    rec = delta2bbox(anchors, d)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), atol=1e-3)


def test_grid_anchors_layout():
    a = grid_anchors((2, 3), 16)
    assert a.shape == (2 * 3 * 3, 4)
    # first anchor centered at (0, 0): ratio 0.5 -> w = 16*8/sqrt(.5)
    w = 16 * 8 / np.sqrt(0.5)
    np.testing.assert_allclose(a[0], [-w / 2, -w * 0.5 / 2, w / 2, w * 0.5 / 2],
                               rtol=1e-5)


def test_rpn_proposals_end_to_end(rng):
    V = 2
    shapes = [(16, 24), (8, 12), (4, 6), (2, 3), (1, 2)]
    strides = [4, 8, 16, 32, 64]
    feats = [jnp.asarray(rng.normal(size=(V, h, w, 32)), dtype=jnp.float32)
             for h, w in shapes]
    head = RPNHead()
    params = head.init(KEY, feats)
    scores, deltas = head.apply(params, feats)
    boxes, s, valid = rpn_proposals(scores, deltas, strides, (64, 96),
                                    nms_pre=50, max_per_img=20)
    assert boxes.shape == (V, 20, 4) and valid.shape == (V, 20)
    b = np.asarray(boxes)[np.asarray(valid)]
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 0] >= 0).all()
    assert (b[:, 2] <= 96).all() and (b[:, 3] <= 64).all()


def test_rpn_nms_is_per_level(rng):
    """mmdet RPN suppresses via batched_nms with LEVEL ids: identical
    boxes on different FPN levels must BOTH survive, while same-level
    duplicates are suppressed (RPNHead._get_bboxes_single)."""
    V = 1
    shapes = [(16, 24), (8, 12)]
    strides = [4, 8]
    A = 3
    scores = [np.full((V, h, w, A), -20.0, np.float32) for h, w in shapes]
    deltas = [np.zeros((V, h, w, A * 4), np.float32) for h, w in shapes]
    # ratio-1.0 anchor is index 1. stride-4 anchor at grid (2, 2) ->
    # center (8, 8), 32x32; upsize it x2 so it EQUALS the stride-8
    # ratio-1 anchor at grid (1, 1) -> center (8, 8), 64x64.
    scores[0][0, 2, 2, 1] = 5.0
    deltas[0][0, 2, 2, 4 + 2] = np.log(2.0)     # dw
    deltas[0][0, 2, 2, 4 + 3] = np.log(2.0)     # dh
    scores[1][0, 1, 1, 1] = 4.0
    # same-level duplicate: stride-8 anchor at grid (1, 1), ratio idx 1,
    # lower score, shifted by one cell -> IoU with the winner ~0.78 > 0.7
    scores[1][0, 1, 2, 1] = 3.0
    boxes, s, valid = rpn_proposals(
        [jnp.asarray(x) for x in scores], [jnp.asarray(x) for x in deltas],
        strides, (128, 128), nms_pre=10, max_per_img=10)
    b = np.asarray(boxes[0])[np.asarray(valid[0])]
    sc = np.asarray(s[0])[np.asarray(valid[0])]
    # both cross-level twins survive (identical coords, scores 5 and 4)
    big = b[sc > 0.9]
    assert len(big) == 2, (b, sc)
    np.testing.assert_allclose(big[0], big[1], atol=1e-4)
    # the same-level overlapping box (score sigmoid(3)~0.95) is gone
    assert not np.any(np.isclose(sc, 1 / (1 + np.exp(-3.0)), atol=1e-4))


def test_rcnn_head_and_decode(rng):
    roi_feats = jnp.asarray(rng.normal(size=(12, 7, 7, 16)), dtype=jnp.float32)
    head = Shared2FCBBoxHead(num_classes=10, fc_out_channels=64)
    params = head.init(KEY, roi_feats)
    logits, deltas = head.apply(params, roi_feats)
    assert logits.shape == (12, 11) and deltas.shape == (12, 40)
    props = jnp.asarray(rng.uniform(10, 50, (12, 4)), dtype=jnp.float32)
    props = props.at[:, 2:].add(60.0)
    boxes, scores = decode_detections(props, logits, deltas, (128, 128))
    assert boxes.shape == (12, 10, 4) and scores.shape == (12, 10)
    s = np.asarray(jax.nn.softmax(logits, -1))
    np.testing.assert_allclose(np.asarray(scores), s[:, :10], rtol=1e-5)


def test_pos2posemb3d_order():
    p = jnp.asarray([[0.3, 0.6, 0.9]])
    e = np.asarray(pos2posemb3d(p, num_pos_feats=4))
    assert e.shape == (1, 12)
    # first block is the y coordinate (ref pe.py:32 order y, x, z)
    np.testing.assert_allclose(e[0, 0], np.sin(0.6 * 2 * np.pi), rtol=1e-5)
    np.testing.assert_allclose(e[0, 4], np.sin(0.3 * 2 * np.pi), rtol=1e-5)


def test_padding_mask():
    shapes = jnp.asarray([[60, 90], [30, 90]])
    m = np.asarray(padding_mask_at_feature_res(shapes, (64, 96), (16, 24)))
    assert not m[0, 0, 0] and not m[0, 14, 22]
    assert m[1, 10, 0]          # below 30px valid rows in view 1
    assert not m[1, 5, 0]


def test_pe_shapes(rng):
    V, H, W, C = 2, 8, 22, 32
    feat = jnp.asarray(rng.normal(size=(V, H, W, C)), dtype=jnp.float32)
    img2lidar = jnp.asarray(np.tile(np.eye(4), (V, 1, 1)), dtype=jnp.float32)
    shapes = jnp.asarray([[128, 352], [128, 352]])
    pe = PE(embed_dims=C, depth_num=8, num_sine_feats=C // 2)
    params = pe.init(KEY, feat, img2lidar, shapes, (128, 352))
    out = pe.apply(params, feat, img2lidar, shapes, (128, 352))
    assert out.shape == (V, H, W, C)
    assert np.isfinite(np.asarray(out)).all()


def test_query_generator_unprojects(rng):
    R, C = 5, 16
    roi_feats = jnp.asarray(rng.normal(size=(R, 7, 7, C)), dtype=jnp.float32)
    K = np.tile(np.eye(4, dtype=np.float32), (R, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 100.0
    ext = np.tile(np.eye(4, dtype=np.float32), (R, 1, 1))
    qg = QueryGenerator(in_channels=C, conv_out_channels=C,
                        fc_out_channels=32, extra_channels=(16, 8))
    params = qg.init(KEY, roi_feats, jnp.asarray(K), jnp.asarray(ext),
                     jnp.ones(R, dtype=bool))
    ref, aux = qg.apply(params, roi_feats, jnp.asarray(K), jnp.asarray(ext),
                        jnp.ones(R, dtype=bool))
    uvd = aux['uvd']
    assert ref.shape == (R, 3) and uvd.shape == (R, 3)
    # identity extrinsic: z_cam == depth
    np.testing.assert_allclose(np.asarray(ref[:, 2]), np.asarray(uvd[:, 2]),
                               rtol=1e-4)


def test_query_generator_aux_branches(rng):
    """Optional cls/size/heading/attr heads (ref query_generator.py
    with_* flags + per-branch conv/fc stacks; off in shipped configs)."""
    R, C = 5, 16
    roi_feats = jnp.asarray(rng.normal(size=(R, 7, 7, C)), dtype=jnp.float32)
    K = np.tile(np.eye(4, dtype=np.float32), (R, 1, 1))
    ext = np.tile(np.eye(4, dtype=np.float32), (R, 1, 1))
    nc = 10
    qg = QueryGenerator(in_channels=C, conv_out_channels=C,
                        fc_out_channels=32, extra_channels=(16, 8),
                        num_classes=nc, with_cls=True, with_size=True,
                        with_heading=True, with_attr=True, attr_dim=2,
                        num_cls_fcs=1, num_size_fcs=2)
    params = qg.init(KEY, roi_feats, jnp.asarray(K), jnp.asarray(ext),
                     jnp.ones(R, dtype=bool))
    ref, aux = qg.apply(params, roi_feats, jnp.asarray(K), jnp.asarray(ext),
                        jnp.ones(R, dtype=bool))
    assert aux['cls_score'].shape == (R, nc + 1)        # softmax-style +bg
    assert aux['size_pred'].shape == (R, 3 * nc)        # class-specific
    assert aux['heading_pred'].shape == (R, 2)          # (sin, cos)
    assert aux['attr_pred'].shape == (R, 2)
    assert ref.shape == (R, 3)
    # branch fc stacks exist with the configured depth
    p = params['params']
    assert 'cls_fc0' in p and 'size_fc1' in p and 'size_fc0' in p
    # class-agnostic size head
    qg2 = QueryGenerator(in_channels=C, conv_out_channels=C,
                         fc_out_channels=32, extra_channels=(16, 8),
                         with_size=True, reg_class_agnostic=True)
    p2 = qg2.init(KEY, roi_feats, jnp.asarray(K), jnp.asarray(ext),
                  jnp.ones(R, dtype=bool))
    _, aux2 = qg2.apply(p2, roi_feats, jnp.asarray(K), jnp.asarray(ext),
                        jnp.ones(R, dtype=bool))
    assert aux2['size_pred'].shape == (R, 3)


def test_box_head_mask_semantics(rng):
    Q, K, C = 6, 10, 32
    refs = jnp.asarray(rng.uniform(0.2, 0.8, (Q, 3)), dtype=jnp.float32)
    keys = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    kpos = jnp.zeros_like(keys)
    cross = np.zeros((Q, K), bool)
    cross[:, :4] = True
    head = CrossAttentionBoxHead(embed_dims=C, num_layers=2, num_heads=4,
                                 feedforward_channels=64)
    params = head.init(KEY, refs, keys, kpos, None, jnp.asarray(cross))
    cls1, box1 = head.apply(params, refs, keys, kpos, None,
                            jnp.asarray(cross))
    assert cls1.shape == (2, Q, 10) and box1.shape == (2, Q, 10)
    # perturb a masked-out key: outputs must not change
    keys2 = keys.at[7].add(50.0)
    cls2, box2 = head.apply(params, refs, keys2, kpos, None,
                            jnp.asarray(cross))
    np.testing.assert_allclose(np.asarray(cls1), np.asarray(cls2), atol=1e-5)
    # perturb a visible key: outputs must change
    keys3 = keys.at[1].add(50.0)
    cls3, _ = head.apply(params, refs, keys3, kpos, None, jnp.asarray(cross))
    assert np.abs(np.asarray(cls1) - np.asarray(cls3)).max() > 1e-4
    # centers decode within pc_range
    b = np.asarray(box1)
    assert (b[..., 0] >= -51.2).all() and (b[..., 0] <= 51.2).all()


def test_box_head_roi_mode(rng):
    Q, Kq, C = 4, 6, 32
    refs = jnp.asarray(rng.uniform(0.2, 0.8, (Q, 3)), dtype=jnp.float32)
    keys = jnp.asarray(rng.normal(size=(Q, Kq, C)), dtype=jnp.float32)
    kpos = jnp.zeros_like(keys)
    cross = jnp.asarray(np.ones((Q, Kq), bool))
    head = CrossAttentionBoxHead(embed_dims=C, num_layers=2, num_heads=4,
                                 feedforward_channels=64)
    params = head.init(KEY, refs, keys, kpos, None, cross)
    cls, box = head.apply(params, refs, keys, kpos, None, cross)
    assert cls.shape == (2, Q, 10)


def test_vovnet_stage_shapes(rng):
    from mv2d_tpu.nn.vovnet import VoVNet
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)), dtype=jnp.float32)
    model = VoVNet(depth=19)
    params = model.init(KEY, x)
    outs = model.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 256), (1, 8, 12, 512), (1, 4, 6, 768), (1, 2, 3, 1024)]


def test_s2d_stem_exact():
    # space-to-depth stem == the plain 7x7/s2 pad-3 conv, same kernel
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mv2d_tpu.nn.resnet import s2d_stem_conv
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 16)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w7, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    out = s2d_stem_conv(x, w7)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_max_pool_3x3_s2_exact():
    # separable slice-max pool == nn.max_pool reduce-window, odd and even
    from flax import linen as nn
    from mv2d_tpu.nn.layers import max_pool_3x3_s2
    rng = np.random.default_rng(3)
    for shape in [(2, 64, 96, 8), (1, 17, 23, 8), (3, 8, 8, 4)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        out = max_pool_3x3_s2(x)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_upsample_nearest_2x_exact():
    # single broadcast+reshape upsample == stacked jnp.repeats, incl. the
    # odd-target crop
    from mv2d_tpu.nn.fpn import _upsample_nearest_2x
    rng = np.random.default_rng(4)
    for h, w, th, tw in [(8, 12, 16, 24), (9, 11, 17, 21)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, 5)), jnp.float32)
        like = jnp.zeros((2, th, tw, 5))
        ref = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)[:, :th, :tw]
        out = _upsample_nearest_2x(x, like)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
