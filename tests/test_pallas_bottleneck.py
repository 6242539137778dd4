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


def test_fused_stage1_matches_blocks(rng):
    """Whole-stage fused band kernel (ops/pallas_stage.py, opt-in
    MV2D_FUSED_STAGE1): parity vs the flax bottleneck chain with folded
    frozen-BN."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from mv2d_tpu.nn.resnet import Bottleneck
    from mv2d_tpu.ops.pallas_stage import fused_stage1

    class Stage(nn.Module):
        n: int = 3

        @nn.compact
        def __call__(self, x):
            for i in range(self.n):
                x = Bottleneck(64, stride=1, downsample=(i == 0),
                               name=f'layer1_{i}')(x)
            return x

    x = jnp.asarray(rng.normal(size=(2, 32, 48, 64)), jnp.float32)
    m = Stage()
    variables = m.init(jax.random.PRNGKey(0), x)
    constants = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype),
        variables['constants'])
    variables = {'params': variables['params'], 'constants': constants}
    ref = m.apply(variables, x)

    def fold(p, c, conv, bn):
        k = p[conv]['kernel']
        s = p[bn]['scale'] / jnp.sqrt(c[bn]['var'] + 1e-5)
        return k * s, p[bn]['bias'] - c[bn]['mean'] * s

    blocks = []
    for i in range(3):
        p = variables['params'][f'layer1_{i}']
        c = variables['constants'][f'layer1_{i}']
        k1, b1 = fold(p, c, 'conv1', 'bn1')
        k2, b2 = fold(p, c, 'conv2', 'bn2')
        k3, b3 = fold(p, c, 'conv3', 'bn3')
        blk = dict(w1=k1[0, 0], b1=b1, w2=k2, b2=b2, w3=k3[0, 0], b3=b3)
        if i == 0:
            kd, bd = fold(p, c, 'downsample_conv', 'downsample_bn')
            blk['wd'] = kd[0, 0]
            blk['bd'] = bd
        blocks.append(blk)
    got = fused_stage1(x, blocks, 64, interpret=True)
    err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
    assert err < 0.05 * float(jnp.abs(ref).max())
