"""Pallas DCN band-kernel parity vs the XLA gather path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv2d_tpu.ops.dcn import _dense_bilinear
from mv2d_tpu.ops.pallas_dcn import pallas_dcn_samples


def _xla_samples(x, sy, sx, m):
    V, H, W, C = x.shape
    Ho, Wo, T = sy.shape[1], sy.shape[2], sy.shape[3]
    P = Ho * Wo * T
    smp = _dense_bilinear(x, sx.reshape(V, P), sy.reshape(V, P))
    smp = smp.reshape(V, Ho, Wo, T, C) * m[..., None]
    return smp.reshape(V, Ho, Wo, T * C)


@pytest.mark.parametrize('stride,shape,off_scale', [
    (1, (3, 32, 88, 128), 2.0),
    (1, (2, 16, 44, 128), 5.0),
    (2, (2, 32, 88, 128), 3.0),
    # Ho not a multiple of RB=8 (R101 @ 1600x640 stage-4 is 20 rows):
    # pins the ceil row-block count (the floor form under-covered Ho and
    # crashed _geometry with a negative pad)
    (1, (2, 20, 56, 128), 2.0),
])
def test_band_kernel_matches_gather(stride, shape, off_scale):
    np.random.seed(0)
    V, H, W, C = shape
    Ho, Wo = H // stride, W // stride
    x = jnp.asarray(np.random.randn(V, H, W, C).astype(np.float32))
    ky, kx = np.meshgrid(np.arange(3), np.arange(3), indexing='ij')
    base_y = (np.arange(Ho) * stride - 1)[:, None, None] + ky.reshape(-1)
    base_x = (np.arange(Wo) * stride - 1)[None, :, None] + kx.reshape(-1)
    off = np.random.randn(V, Ho, Wo, 9, 2) * off_scale
    sy = jnp.asarray((base_y[None] + off[..., 0]).astype(np.float32))
    sx = jnp.asarray((base_x[None] + off[..., 1]).astype(np.float32))
    m = jnp.asarray(np.random.rand(V, Ho, Wo, 9).astype(np.float32))

    ref = _xla_samples(x, sy, sx, m)
    out = pallas_dcn_samples(x, sy, sx, m, stride=stride, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_large_offsets_use_fallback():
    """Offsets way beyond the band margin must still be exact."""
    np.random.seed(1)
    V, H, W, C = 2, 32, 88, 128
    x = jnp.asarray(np.random.randn(V, H, W, C).astype(np.float32))
    ky, kx = np.meshgrid(np.arange(3), np.arange(3), indexing='ij')
    base_y = (np.arange(H) - 1)[:, None, None] + ky.reshape(-1)
    base_x = (np.arange(W) - 1)[None, :, None] + kx.reshape(-1)
    off = np.zeros((V, H, W, 9, 2), np.float32)
    # a handful of big jumps (up to +-25 px)
    off[0, 5, 7, 3] = (20.0, -25.0)
    off[1, 20, 60, 8] = (-18.0, 30.0)
    off[0, 31, 87, 0] = (15.0, 15.0)
    sy = jnp.asarray((base_y[None] + off[..., 0]).astype(np.float32))
    sx = jnp.asarray((base_x[None] + off[..., 1]).astype(np.float32))
    m = jnp.ones((V, H, W, 9), jnp.float32)
    ref = _xla_samples(x, sy, sx, m)
    out = pallas_dcn_samples(x, sy, sx, m, stride=1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_zero_tangent():
    np.random.seed(2)
    V, H, W, C = 1, 16, 16, 128
    x = jnp.asarray(np.random.randn(V, H, W, C).astype(np.float32))
    sy = jnp.asarray(np.random.uniform(0, H - 1, (V, H, W, 9)).astype(np.float32))
    sx = jnp.asarray(np.random.uniform(0, W - 1, (V, H, W, 9)).astype(np.float32))
    m = jnp.ones((V, H, W, 9), jnp.float32)
    out, tang = jax.jvp(lambda a: pallas_dcn_samples(a, sy, sx, m,
                                                     interpret=True),
                        (x,), (jnp.ones_like(x),))
    assert float(jnp.abs(tang).max()) == 0.0


@pytest.mark.parametrize('stride', [1, 2])
def test_conv_kernel_matches_einsum(stride):
    """pallas_dcn_conv == einsum(pallas samples, w), incl big-offset
    overflow samples."""
    from mv2d_tpu.ops.pallas_dcn import pallas_dcn_conv
    np.random.seed(3)
    V, H, W, C, F = 2, 32, 88, 128, 64
    Ho, Wo = H // stride, W // stride
    x = jnp.asarray(np.random.randn(V, H, W, C).astype(np.float32))
    ky, kx = np.meshgrid(np.arange(3), np.arange(3), indexing='ij')
    base_y = (np.arange(Ho) * stride - 1)[:, None, None] + ky.reshape(-1)
    base_x = (np.arange(Wo) * stride - 1)[None, :, None] + kx.reshape(-1)
    off = np.random.randn(V, Ho, Wo, 9, 2) * 3.0
    off[0, 2, 3, 1] = (25.0, -30.0)     # force overflow fallbacks
    off[1, 10, 40, 7] = (-22.0, 28.0)
    sy = jnp.asarray((base_y[None] + off[..., 0]).astype(np.float32))
    sx = jnp.asarray((base_x[None] + off[..., 1]).astype(np.float32))
    m = jnp.asarray(np.random.rand(V, Ho, Wo, 9).astype(np.float32))
    w = jnp.asarray(np.random.randn(9, C, F).astype(np.float32)) * 0.05
    ref = jnp.einsum(
        'vhwq,qf->vhwf',
        pallas_dcn_samples(x, sy, sx, m, stride=stride, interpret=True),
        w.reshape(9 * C, F))
    out = pallas_dcn_conv(x, sy, sx, m, w, stride=stride, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('stride,shape,off_scale', [
    (1, (2, 16, 24, 128), 2.0),
    (2, (2, 32, 24, 128), 3.0),
    (1, (2, 16, 24, 128), 0.0),   # zero-init offsets: integer coords
])
def test_band_sampling_grads_match_gather(stride, shape, off_scale):
    """dcn_modulated_samples custom VJP vs autodiff of the XLA gather path
    (incl. the integer-coordinate case the offset conv starts at)."""
    np.random.seed(2)
    V, H, W, C = shape
    Ho, Wo = H // stride, W // stride
    x = jnp.asarray(np.random.randn(V, H, W, C).astype(np.float32))
    ky, kx = np.meshgrid(np.arange(3), np.arange(3), indexing='ij')
    base_y = (np.arange(Ho) * stride - 1)[:, None, None] + ky.reshape(-1)
    base_x = (np.arange(Wo) * stride - 1)[None, :, None] + kx.reshape(-1)
    off = np.random.randn(V, Ho, Wo, 9, 2) * off_scale
    # a couple of out-of-band samples exercise the overflow grads
    if off_scale:
        off[0, 1, 2, 3] = (14.0, -17.0)
        off[1, 3, 5, 7] = (-12.0, 19.0)
    sy = jnp.asarray((base_y[None] + off[..., 0]).astype(np.float32))
    sx = jnp.asarray((base_x[None] + off[..., 1]).astype(np.float32))
    m = jnp.asarray(np.random.rand(V, Ho, Wo, 9).astype(np.float32))
    g = jnp.asarray(np.random.randn(V, Ho, Wo, 9 * C).astype(np.float32))

    from mv2d_tpu.ops.pallas_dcn import dcn_modulated_samples

    def loss_ref(x, sy, sx, m):
        return (_xla_samples(x, sy, sx, m) * g).sum()

    def loss_band(x, sy, sx, m):
        return (dcn_modulated_samples(x, sy, sx, m, stride=stride,
                                      interpret=True) * g).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, sy, sx, m)
    gb = jax.grad(loss_band, argnums=(0, 1, 2, 3))(x, sy, sx, m)
    for a, b, nm in zip(gb, gr, ['dx', 'dsy', 'dsx', 'dm']):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3, err_msg=nm)


def test_dcn_modulated_conv_train_matches_reference(rng):
    """Reordered-contraction training DCN: output and gradients match the
    dense-gather reference einsum (values + grads to x, offsets, mask, w)."""
    import jax
    from mv2d_tpu.ops.dcn import _dense_bilinear
    from mv2d_tpu.ops.pallas_dcn import dcn_modulated_conv_train

    V, H, W, C, F = 2, 16, 24, 8, 16
    Ho, Wo = H, W
    x = jnp.asarray(rng.normal(size=(V, H, W, C)), jnp.float32)
    base_y = jnp.arange(H, dtype=jnp.float32)[:, None, None] + \
        jnp.asarray([-1, -1, -1, 0, 0, 0, 1, 1, 1], jnp.float32)
    base_x = jnp.arange(W, dtype=jnp.float32)[None, :, None] + \
        jnp.asarray([-1, 0, 1, -1, 0, 1, -1, 0, 1], jnp.float32)
    off = rng.normal(0, 2.0, (V, Ho, Wo, 9, 2)).astype(np.float32)
    off[0, 3, 4, 2] = (25.0, -9.0)        # far out-of-band -> overflow path
    sy = jnp.asarray(base_y[None] + off[..., 0])
    sx = jnp.asarray(base_x[None] + off[..., 1])
    m = jnp.asarray(rng.uniform(0.2, 1.0, (V, Ho, Wo, 9)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(9, C, F)), jnp.float32)

    def ref(x_, sy_, sx_, m_, w_):
        P = Ho * Wo * 9
        s = _dense_bilinear(x_, sx_.reshape(V, P), sy_.reshape(V, P))
        s = s.reshape(V, Ho, Wo, 9, C) * m_[..., None]
        return jnp.einsum('vhwkc,kcf->vhwf', s, w_)

    def new(x_, sy_, sx_, m_, w_):
        return dcn_modulated_conv_train(x_, sy_, sx_, m_, w_,
                                        interpret=True)

    want = ref(x, sy, sx, m, w)
    got = new(x, sy, sx, m, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)

    cot = jnp.asarray(rng.normal(size=want.shape), jnp.float32)
    g_ref = jax.grad(lambda *a: (ref(*a) * cot).sum(),
                     argnums=(0, 1, 2, 3, 4))(x, sy, sx, m, w)
    g_new = jax.grad(lambda *a: (new(*a) * cot).sum(),
                     argnums=(0, 1, 2, 3, 4))(x, sy, sx, m, w)
    for a, b, nm in zip(g_new, g_ref, 'x sy sx m w'.split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2, err_msg=nm)
