"""Fused stage-chain band kernels (ops/pallas_stage.py) vs the plain
XLA bottleneck chain (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv2d_tpu.nn.resnet import Bottleneck


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


def test_fused_identity_chain_matches_blocks(rng):
    """Identity-chain variant (stage-N blocks 1..N-1, no downsample)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from mv2d_tpu.nn.resnet import Bottleneck
    from mv2d_tpu.ops.pallas_stage import fused_identity_chain

    class Chain(nn.Module):
        n: int = 3

        @nn.compact
        def __call__(self, x):
            for i in range(self.n):
                x = Bottleneck(32, stride=1, downsample=False,
                               name=f'layer2_{i + 1}')(x)
            return x

    x = jnp.asarray(rng.normal(size=(2, 32, 48, 128)), jnp.float32)
    m = Chain()
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
        p = variables['params'][f'layer2_{i + 1}']
        c = variables['constants'][f'layer2_{i + 1}']
        k1, b1 = fold(p, c, 'conv1', 'bn1')
        k2, b2 = fold(p, c, 'conv2', 'bn2')
        k3, b3 = fold(p, c, 'conv3', 'bn3')
        blocks.append(dict(w1=k1[0, 0], b1=b1, w2=k2, b2=b2,
                           w3=k3[0, 0], b3=b3))
    got = fused_identity_chain(x, blocks, 32, interpret=True)
    err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
    assert err < 0.05 * float(jnp.abs(ref).max())
