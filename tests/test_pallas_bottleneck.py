"""Fused bottleneck kernel vs the plain XLA bottleneck (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv2d_tpu.nn.resnet import Bottleneck


@pytest.mark.parametrize('planes,c,h,w', [(64, 256, 40, 72), (128, 512, 18, 40)])
def test_fused_matches_xla(planes, c, h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
    m = Bottleneck(planes, fused=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats so the affine fold is actually exercised
    variables = jax.tree.map(
        lambda a: a + 0.05 * jnp.asarray(
            np.random.default_rng(1).normal(size=a.shape), a.dtype),
        variables)
    ref = m.apply(variables, x)
    out = m.apply(variables, x, fast_inference=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_odd_sizes():
    # H not a BH multiple and W not 8-aligned exercise the pad/slice path
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 19, 27, 256)), jnp.float32)
    m = Bottleneck(64, fused=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(variables, x)
    out = m.apply(variables, x, fast_inference=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
