"""Numerical parity vs torch ops (CPU torch is available in the image).

These tests validate the WEIGHT-MAPPING semantics of the checkpoint
converter: a torch module's parameters are converted with the same rules as
train/checkpoint.py and must then produce identical outputs.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mv2d_tpu.nn.decoder import MHA  # noqa: E402


def test_mha_matches_torch_multihead_attention(rng):
    """Our split-projection MHA == torch packed-in_proj MultiheadAttention
    after converting weights with the in_proj split rule."""
    C, H, Q, K = 64, 4, 10, 20
    tm = torch.nn.MultiheadAttention(C, H, dropout=0.0, batch_first=False)
    tm.eval()
    q = rng.normal(size=(Q, C)).astype(np.float32)
    k = rng.normal(size=(K, C)).astype(np.float32)
    v = rng.normal(size=(K, C)).astype(np.float32)
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(q)[:, None],
                     torch.from_numpy(k)[:, None],
                     torch.from_numpy(v)[:, None])
    want = want[:, 0].numpy()

    # convert weights exactly like train/checkpoint.py (packed in_proj split
    # into thirds, [out, in] -> [in, out] transpose)
    inw = tm.in_proj_weight.detach().numpy()
    inb = tm.in_proj_bias.detach().numpy()
    qw, kw, vw = np.split(inw, 3, axis=0)
    qb, kb, vb = np.split(inb, 3, axis=0)
    params = {'params': {
        'q_proj': {'kernel': qw.T, 'bias': qb},
        'k_proj': {'kernel': kw.T, 'bias': kb},
        'v_proj': {'kernel': vw.T, 'bias': vb},
        'out_proj': {'kernel': tm.out_proj.weight.detach().numpy().T,
                     'bias': tm.out_proj.bias.detach().numpy()},
    }}
    mha = MHA(embed_dims=C, num_heads=H, attn_drop=0.0, proj_drop=0.0)
    got = mha.apply(params, jnp.asarray(q)[None], jnp.asarray(k)[None],
                    jnp.asarray(v)[None], None, True)[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_mha_key_padding_equivalence(rng):
    """Our 'allowed' mask == torch key_padding_mask semantics."""
    C, H, Q, K = 32, 2, 6, 12
    tm = torch.nn.MultiheadAttention(C, H, dropout=0.0)
    tm.eval()
    q = rng.normal(size=(Q, C)).astype(np.float32)
    k = rng.normal(size=(K, C)).astype(np.float32)
    pad = np.zeros((1, K), bool)
    pad[0, 8:] = True
    with torch.no_grad():
        want, _ = tm(torch.from_numpy(q)[:, None],
                     torch.from_numpy(k)[:, None],
                     torch.from_numpy(k)[:, None],
                     key_padding_mask=torch.from_numpy(pad))
    want = want[:, 0].numpy()
    inw = tm.in_proj_weight.detach().numpy()
    inb = tm.in_proj_bias.detach().numpy()
    qw, kw, vw = np.split(inw, 3, axis=0)
    qb, kb, vb = np.split(inb, 3, axis=0)
    params = {'params': {
        'q_proj': {'kernel': qw.T, 'bias': qb},
        'k_proj': {'kernel': kw.T, 'bias': kb},
        'v_proj': {'kernel': vw.T, 'bias': vb},
        'out_proj': {'kernel': tm.out_proj.weight.detach().numpy().T,
                     'bias': tm.out_proj.bias.detach().numpy()},
    }}
    allowed = jnp.asarray(~pad)[None].repeat(Q, axis=1).reshape(1, Q, K)
    mha = MHA(embed_dims=C, num_heads=H, attn_drop=0.0, proj_drop=0.0)
    got = mha.apply(params, jnp.asarray(q)[None], jnp.asarray(k)[None],
                    jnp.asarray(k)[None], allowed, True)[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_frozen_bn_matches_torch(rng):
    """FrozenBatchNorm == torch BatchNorm2d.eval() with converted stats."""
    tbn = torch.nn.BatchNorm2d(8)
    tbn.eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(
            rng.normal(1, 0.2, 8).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(
            rng.normal(0, 0.2, 8).astype(np.float32)))
        tbn.running_mean.copy_(torch.from_numpy(
            rng.normal(0, 1, 8).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(
            rng.uniform(0.5, 2, 8).astype(np.float32)))
    x = rng.normal(size=(1, 8, 4, 5)).astype(np.float32)
    with torch.no_grad():
        want = tbn(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    from mv2d_tpu.nn.layers import FrozenBatchNorm
    variables = {
        'params': {'scale': jnp.asarray(tbn.weight.detach().numpy()),
                   'bias': jnp.asarray(tbn.bias.detach().numpy())},
        'constants': {'mean': jnp.asarray(tbn.running_mean.numpy()),
                      'var': jnp.asarray(tbn.running_var.numpy())}}
    bn = FrozenBatchNorm(8)
    got = bn.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_conv_weight_mapping_matches_torch(rng):
    """OIHW -> HWIO conversion: torch Conv2d == flax Conv with converted
    kernel (stride-2 7x7, the ResNet stem case)."""
    tc = torch.nn.Conv2d(3, 16, 7, stride=2, padding=3, bias=False)
    tc.eval()
    x = rng.normal(size=(1, 3, 32, 40)).astype(np.float32)
    with torch.no_grad():
        want = tc(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    from flax import linen as nn
    from mv2d_tpu.train.checkpoint import _conv
    conv = nn.Conv(16, (7, 7), strides=2, padding=[(3, 3)] * 2,
                   use_bias=False)
    params = {'params': {'kernel': jnp.asarray(
        _conv(tc.weight.detach().numpy()))}}
    got = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
