import jax
import jax.numpy as jnp
import numpy as np

from mv2d_tpu import configs
from mv2d_tpu.models.mv2d import MV2D, GroundTruth3D
from mv2d_tpu.ops.focal_loss import sigmoid_focal_loss


def test_dn_self_attention_mask_structure():
    cfg = configs.tiny()          # denoise_scalar=3, max_gt=4
    model = MV2D(cfg)
    m = model.bind({'params': {}})
    R = 10
    P, G, S = cfg.dn_pad, cfg.max_gt, cfg.denoise_scalar
    allowed = np.asarray(m._dn_self_mask(jnp.ones(R, bool),
                                         jnp.ones(P, bool)))
    assert allowed.shape == (P + R, P + R)
    # match queries see each other
    assert allowed[P:, P:].all()
    # match queries cannot see any DN query (ref attn_mask[pad:, :pad]=True)
    assert not allowed[P:, :P].any()
    # DN group i sees itself but not other groups
    for i in range(S):
        s, e = i * G, (i + 1) * G
        assert allowed[s:e, s:e].all()
        for j in range(S):
            if j != i:
                assert not allowed[s:e, j * G:(j + 1) * G].any()
    # DN queries can see match queries (not masked in the reference)
    assert allowed[:P, P:].all()

    # invalid (padded) slots must not act as keys - except on the diagonal
    mv = np.ones(R, bool)
    mv[3] = False
    dv = np.ones(P, bool)
    dv[1] = False
    a2 = np.asarray(m._dn_self_mask(jnp.asarray(mv), jnp.asarray(dv)))
    col = P + 3
    assert not a2[np.arange(P + R) != col, col].any() and a2[col, col]
    assert not a2[np.arange(P + R) != 1, 1].any() and a2[1, 1]
    # valid structure is unchanged elsewhere
    assert a2[P:, P + 4:].all()


def test_match_self_mask_blocks_invalid_columns():
    cfg = configs.tiny()
    m = MV2D(cfg).bind({'params': {}})
    v = jnp.asarray([True, False, True, False])
    a = np.asarray(m._match_self_mask(v))
    want = np.asarray([[1, 0, 1, 0], [1, 1, 1, 0],
                       [1, 0, 1, 0], [1, 0, 1, 1]], bool)
    np.testing.assert_array_equal(a, want)


def test_dn_noise_and_labels(rng):
    cfg = configs.tiny()
    model = MV2D(cfg)
    m = model.bind({'params': {}})
    G = cfg.max_gt
    boxes = np.zeros((G, 9), np.float32)
    boxes[:2, :3] = [[10, 5, -1], [-20, 8, 0]]
    boxes[:2, 3:6] = 2.0
    gt = GroundTruth3D(boxes=jnp.asarray(boxes),
                       labels=jnp.asarray([1, 2] + [0] * (G - 2),
                                          jnp.int32),
                       valid=jnp.asarray(np.arange(G) < 2))
    refs, info = m._prepare_dn(gt, jax.random.PRNGKey(0))
    refs = np.asarray(refs)
    assert refs.shape == (cfg.dn_pad, 3)
    assert (refs >= 0).all() and (refs <= 1).all()
    # valid mask tiles gt.valid across groups
    v = np.asarray(info.valid).reshape(cfg.denoise_scalar, G)
    assert (v[:, :2]).all() and not v[:, 2:].any()
    # labels: original or flipped to background (num_classes)
    labs = np.asarray(info.known_labels).reshape(cfg.denoise_scalar, G)
    ok = np.isin(labs[:, 0], [1, cfg.num_classes])
    assert ok.all()
    # some noise must flip labels to negative at scale 1.25/split 0.6
    refs2, info2 = m._prepare_dn(gt, jax.random.PRNGKey(3))
    labs_all = np.concatenate([np.asarray(info.known_labels),
                               np.asarray(info2.known_labels)])
    assert (labs_all == cfg.num_classes).sum() > 0


def test_focal_loss_matches_numpy_oracle(rng):
    N, C = 40, 10
    logits = rng.normal(size=(N, C)).astype(np.float32)
    labels = rng.integers(0, C + 1, N)       # C = background
    weights = rng.uniform(0, 1, N).astype(np.float32)
    got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(weights), C,
                                   avg_factor=7.0, loss_weight=2.0))
    # numpy oracle of mmdet sigmoid focal loss
    p = 1 / (1 + np.exp(-logits))
    t = np.zeros((N, C))
    for i, l in enumerate(labels):
        if l < C:
            t[i, l] = 1
    pt = p * t + (1 - p) * (1 - t)
    alpha_t = 0.25 * t + 0.75 * (1 - t)
    ce = -(t * np.log(p + 1e-12) + (1 - t) * np.log(1 - p + 1e-12))
    loss = (alpha_t * (1 - pt) ** 2 * ce).sum(-1) * weights
    want = 2.0 * loss.sum() / 7.0
    np.testing.assert_allclose(got, want, rtol=1e-4)
