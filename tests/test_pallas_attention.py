import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv2d_tpu.ops import attention as xla_attn
from mv2d_tpu.ops.pallas_attention import masked_flash_attention


@pytest.mark.parametrize('Q,K,C,H', [(32, 256, 64, 4), (50, 300, 32, 2)])
def test_flash_matches_xla(rng, Q, K, C, H):
    q = jnp.asarray(rng.normal(size=(Q, C)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    allowed = rng.uniform(size=(Q, K)) > 0.6
    allowed[0, :] = False          # fully-masked row
    allowed[1, :] = True
    ref = xla_attn.multi_head_attention(q[None], k[None], v[None], H,
                                        jnp.asarray(allowed)[None])[0]
    out = masked_flash_attention(q, k, v, jnp.asarray(allowed), H,
                                 block_q=16, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out)[0], 0.0, atol=1e-6)


@pytest.mark.parametrize('Q,K,C,H', [(32, 256, 64, 4), (50, 300, 32, 2)])
def test_flash_vjp_matches_xla_grads(rng, Q, K, C, H):
    q = jnp.asarray(rng.normal(size=(Q, C)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    allowed = rng.uniform(size=(Q, K)) > 0.6
    allowed[0, :] = False          # fully-masked row
    allowed[1, :] = True
    allowed = jnp.asarray(allowed)
    w = jnp.asarray(rng.normal(size=(Q, C)), dtype=jnp.float32)

    def loss_ref(q, k, v):
        out = xla_attn.multi_head_attention(q[None], k[None], v[None], H,
                                            allowed[None])[0]
        return (out * w).sum()

    def loss_flash(q, k, v):
        out = masked_flash_attention(q, k, v, allowed, H, block_q=16,
                                     interpret=True)
        return (out * w).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, nm in zip(g_fl, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3, err_msg=nm)


@pytest.mark.parametrize('Q,K,C,H', [(32, 256, 64, 4), (50, 300, 32, 2),
                                     (64, 1024, 64, 8)])
def test_flash_sparse_matches_xla(rng, Q, K, C, H):
    from mv2d_tpu.ops.pallas_attention import _flash_sparse
    q = jnp.asarray(rng.normal(size=(Q, C)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    allowed = rng.uniform(size=(Q, K)) > 0.9     # sparse mask
    allowed[0, :] = False                        # fully-masked row
    allowed[1, :] = True
    allowed[:, 64:128] = False                   # a fully-dead k-block
    ref = xla_attn.multi_head_attention(q[None], k[None], v[None], H,
                                        jnp.asarray(allowed)[None])[0]
    out = _flash_sparse(q, k, v, jnp.asarray(allowed), H, 16, 64, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out)[0], 0.0, atol=1e-6)


def test_flash_sparse_vjp(rng):
    from mv2d_tpu.ops.pallas_attention import _flash_sparse
    Q, K, C, H = 32, 256, 64, 4
    q = jnp.asarray(rng.normal(size=(Q, C)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    allowed = jnp.asarray(rng.uniform(size=(Q, K)) > 0.8)
    w = jnp.asarray(rng.normal(size=(Q, C)), dtype=jnp.float32)

    def loss_ref(q, k, v):
        out = xla_attn.multi_head_attention(q[None], k[None], v[None], H,
                                            allowed[None])[0]
        return (out * w).sum()

    def loss_sp(q, k, v):
        return (_flash_sparse(q, k, v, allowed, H, 16, 64, True) * w).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    for a, b, nm in zip(g_sp, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3, err_msg=nm)


def test_flash_mixed_fwd_and_vjp(rng):
    """'mixed' = sparse forward + dense backward: values AND grads must
    both match the XLA attention (the two kernels compute the same exact
    masked attention, so pairing them is valid)."""
    from mv2d_tpu.ops.pallas_attention import _flash_mixed
    Q, K, C, H = 50, 300, 32, 2
    q = jnp.asarray(rng.normal(size=(Q, C)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(K, C)), dtype=jnp.float32)
    allowed = rng.uniform(size=(Q, K)) > 0.6
    allowed[0, :] = False          # fully-masked row
    allowed[1, :] = True
    allowed = jnp.asarray(allowed)
    w = jnp.asarray(rng.normal(size=(Q, C)), dtype=jnp.float32)

    ref = xla_attn.multi_head_attention(q[None], k[None], v[None], H,
                                        allowed[None])[0]
    out = _flash_mixed(q, k, v, allowed, H, 16, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)

    def loss_ref(q, k, v):
        out = xla_attn.multi_head_attention(q[None], k[None], v[None], H,
                                            allowed[None])[0]
        return (out * w).sum()

    def loss_mixed(q, k, v):
        return (_flash_mixed(q, k, v, allowed, H, 16, 128, True) * w).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_mx = jax.grad(loss_mixed, argnums=(0, 1, 2))(q, k, v)
    for a, b, nm in zip(g_mx, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3, err_msg=nm)
