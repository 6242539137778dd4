"""Masked flash attention as a Pallas TPU kernel.

The MV2D decoder's cross attention has a PER-QUERY boolean key mask (the
epipolar correlation sparsity, ref cross_attention_head.py:33-45).  The XLA
path (ops/attention.py) materializes [H, Q, K] logits in HBM (~1 GB per layer
at full size); this kernel keeps logits in VMEM.

Layout: grid (Q/BQ,) with ALL heads folded into one step.  The K/V panels
[H, K, D] live in VMEM for the whole kernel (16 MB at K_MAX=16384, C=256
bf16) and their BlockSpec index is constant, so they are DMA'd exactly once;
the [BQ, K] mask block is read once per q-block and shared by all heads.
(The earlier grid-(H, Q/BQ) form re-read the mask once per head: ~250 MB of
avoidable HBM traffic per layer at 960 queries.)  Head-size K/V panels are
small enough that no online-softmax key blocking is needed - each head's
[BQ, K] logits are a VMEM transient.

Fully-masked query rows produce zeros (matching ops.attention.masked_softmax
semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, heads: int,
            scale: float):
    # q_ref: [H, BQ, D]; k_ref/v_ref: [H, K, D]; mask_ref: [BQ, K] bf16 0/1
    # (int8 vector compares are unsupported on v5e Mosaic); o_ref: [H, BQ, D]
    msk = mask_ref[:].astype(jnp.float32)            # [BQ, K]
    bias = (msk - 1.0) * (-_NEG)                     # 0 where on, -1e9 off
    for h in range(heads):
        q = q_ref[h].astype(jnp.float32) * scale     # [BQ, D]
        k = k_ref[h].astype(jnp.float32)             # [K, D]
        v = v_ref[h].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [BQ, K]
        logits = logits * msk + bias
        m = logits.max(-1, keepdims=True)
        p = jnp.exp(logits - m) * msk
        l = p.sum(-1, keepdims=True)
        out = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[h] = (out / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _split_heads(x, P, H, D):
    n = x.shape[0]
    return jnp.pad(x, ((0, P - n), (0, 0))).reshape(P, H, D).transpose(1, 0, 2)


def _pack(q, k, v, allowed, num_heads, block_q, k_align=128):
    Q, C = q.shape
    K = k.shape[0]
    H = num_heads
    D = C // H
    BQ = min(block_q, max(8, Q))
    Qp = -(-Q // BQ) * BQ
    Kp = -(-K // k_align) * k_align
    qh = _split_heads(q, Qp, H, D)                              # [H, Qp, D]
    kh = _split_heads(k, Kp, H, D)
    vh = _split_heads(v, Kp, H, D)
    msk = jnp.pad(allowed.astype(jnp.bfloat16), ((0, Qp - Q), (0, Kp - K)))
    return qh, kh, vh, msk, (Q, K, H, D, BQ, Qp, Kp)


def _fwd_call(qh, kh, vh, msk, dims, interpret):
    Q, K, H, D, BQ, Qp, Kp = dims
    return pl.pallas_call(
        functools.partial(_kernel, heads=H, scale=1.0 / (D ** 0.5)),
        grid=(Qp // BQ,),
        in_specs=[
            pl.BlockSpec((H, BQ, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Kp, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Kp, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, BQ, D), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Qp, D), qh.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qh, kh, vh, msk)


def _sparse_kernel(count_ref, idx_ref, q_ref, kt_ref, vt_ref, mask_ref,
                   o_ref, m_ref, l_ref, *, heads: int, scale: float,
                   nK: int):
    # Block-sparse form: the [BQ, K] mask is only ~3% dense bitwise and
    # ~50% dense at [BQ=64, BK=512] tile granularity (measured on bench
    # shapes), so half the per-head [BQ, K] softmax VPU chains and QK/PV
    # dots are over all-masked tiles.  The grid stays (Q/BQ,); each step
    # walks ONLY its q-block's active k-blocks (scalar-prefetched
    # compacted list) with an online softmax.  K/V live VMEM-resident in
    # block-major TRANSPOSED layout [nK, H, D, BK] so K rides the
    # 128-lane axis (no D=32 lane padding) and a block fetch is a cheap
    # leading-dim dynamic index.
    i = pl.program_id(0)
    cnt = count_ref[i]
    for h in range(heads):
        q = q_ref[h].astype(jnp.float32) * scale          # [BQ, D]
        BQ, D = q.shape

        def body(s, carry):
            m, l, o = carry
            b = idx_ref[i * nK + s]
            kt = kt_ref[b, h].astype(jnp.float32)         # [D, BK]
            vt = vt_ref[b, h].astype(jnp.float32)
            msk = mask_ref[b].astype(jnp.float32)         # [BQ, BK]
            logits = jax.lax.dot_general(
                q, kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [BQ, BK]
            logits = logits * msk + (msk - 1.0) * (-_NEG)
            bm = logits.max(-1, keepdims=True)
            m_new = jnp.maximum(m, bm)
            p = jnp.exp(logits - m_new) * msk
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + p.sum(-1, keepdims=True)
            pv = jax.lax.dot_general(
                p, vt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [BQ, D]
            return m_new, l_new, o * alpha + pv

        m0 = jnp.full((BQ, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((BQ, 1), jnp.float32)
        o0 = jnp.zeros((BQ, D), jnp.float32)
        m, l, o = jax.lax.fori_loop(0, cnt, body, (m0, l0, o0))
        o_ref[h] = (o / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)
        m_ref[h] = m                                      # softmax stats for
        l_ref[h] = l                                      # the sparse bwd


def _sparse_fwd_call(qh, kh, vh, msk, dims, block_k, interpret):
    Q, K, H, D, BQ, Qp, Kp = dims
    BK = block_k
    assert Kp % BK == 0
    nQ, nK = Qp // BQ, Kp // BK
    # block-major transposed K/V panels; mask re-laid out k-block-major
    ktb = kh.reshape(H, nK, BK, D).transpose(1, 0, 3, 2)  # [nK, H, D, BK]
    vtb = vh.reshape(H, nK, BK, D).transpose(1, 0, 3, 2)
    mskb = msk.reshape(Qp, nK, BK).transpose(1, 0, 2)     # [nK, Qp, BK]
    counts, active_idx = _sparse_blocks(msk, dims, BK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nQ,),
        in_specs=[
            pl.BlockSpec((H, BQ, D), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nK, H, D, BK), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nK, H, D, BK), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nK, BQ, BK), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((H, BQ, D), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, BQ, 1), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, BQ, 1), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_sparse_kernel, heads=H, scale=1.0 / (D ** 0.5),
                          nK=nK),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((H, Qp, D), qh.dtype),
                   jax.ShapeDtypeStruct((H, Qp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((H, Qp, 1), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(counts, active_idx, qh, ktb, vtb, mskb)


def _sparse_blocks(msk, dims, BK):
    Q, K, H, D, BQ, Qp, Kp = dims
    nQ, nK = Qp // BQ, Kp // BK
    blk = (msk.reshape(nQ, BQ, nK, BK) > 0).any(axis=(1, 3))      # [nQ, nK]
    counts = blk.sum(axis=1).astype(jnp.int32)
    active_idx = jnp.argsort(~blk, axis=1, stable=True).astype(jnp.int32)
    return counts, active_idx.reshape(-1)


def masked_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           allowed: jnp.ndarray, num_heads: int,
                           block_q: int = 64, block_k: int | None = None,
                           interpret: bool | None = None,
                           sparse: bool | None = None) -> jnp.ndarray:
    """q: [Q, C]; k, v: [K, C]; allowed: [Q, K] bool -> [Q, C].

    Pads Q and K to block multiples; padded keys are masked out, padded
    queries discarded.  block_k sizes the sparse path's key tiles
    (default 512, MV2D_FLASH_BK env overrides); the dense path ignores it
    (key blocking is not needed - logits stay VMEM-resident per head).

    Differentiable: a custom VJP routes the backward pass through a flash
    backward kernel (softmax recompute per q-block, dK/dV accumulated in
    VMEM across the sequential grid) so training never materializes the
    [H, Q, K] logits in HBM either.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    import os
    env = os.environ.get('MV2D_FLASH_SPARSE', '')
    if env:
        # explicit A/B override wins: 1 sparse, 0 dense, mixed hybrid
        use_sparse = {'1': True, '0': False, 'mixed': 'mixed'}[env]
    else:
        use_sparse = True if sparse is None else sparse
    if use_sparse:
        # block-sparse grid (the correlation mask is ~50% dense at
        # [64, 512] tile granularity -> ~2x less VPU/MXU work; measured
        # eval 10.22 -> 10.5 samples/sec/chip).  The TRAINING step is
        # faster on the dense-grid kernels (294.5 vs 305.4 ms/scene: the
        # sparse bwd's block-list loop + block-major accumulators lose to
        # the one-shot [BQ, K] bwd at DN-padded query counts), so the
        # decoder passes sparse=deterministic (eval sparse, train dense).
        # MV2D_FLASH_SPARSE=1/0 forces either path; MV2D_FLASH_BK
        # overrides the key tile (finer tiles skip more mask but pay more
        # steps).  An explicitly passed block_k wins unless the env var
        # is set; either way it must be a 128-lane multiple (Mosaic fails
        # obscurely otherwise).
        env_bk = os.environ.get('MV2D_FLASH_BK', '')
        bk = int(env_bk) if env_bk else (block_k or 512)
        if bk % 128 != 0 and not interpret:
            # Mosaic lane constraint on real TPU; interpret mode is exempt
            raise ValueError(
                f'sparse flash block_k must be a multiple of 128, got {bk} '
                f'(from {"MV2D_FLASH_BK" if env_bk else "block_k"})')
        if use_sparse == 'mixed':
            # hybrid for training: sparse forward, dense one-shot backward
            return _flash_mixed(q, k, v, allowed, num_heads, block_q,
                                bk, interpret)
        return _flash_sparse(q, k, v, allowed, num_heads, block_q,
                             bk, interpret)
    return _flash(q, k, v, allowed, num_heads, block_q, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, allowed, num_heads, block_q, interpret):
    qh, kh, vh, msk, dims = _pack(q, k, v, allowed, num_heads, block_q)
    Q, K, H, D, BQ, Qp, Kp = dims
    out = _fwd_call(qh, kh, vh, msk, dims, interpret)
    return out.transpose(1, 0, 2).reshape(Qp, H * D)[:Q]


def _flash_fwd(q, k, v, allowed, num_heads, block_q, interpret):
    return (_flash(q, k, v, allowed, num_heads, block_q, interpret),
            (q, k, v, allowed))


def _bwd_kernel(q_ref, kt_ref, vt_ref, mask_ref, do_ref,
                dq_ref, dkt_ref, dvt_ref, *, heads: int, scale: float,
                nblocks: int):
    # Grid (H/hg, nblocks): head groups OUTERMOST, q-blocks innermost.
    # q/do blocks: [hg, BQ, D]; K/V arrive TRANSPOSED [hg, D, K] so every
    # K-sized buffer keeps K on the 128-lane axis (a [K, 32] layout pads
    # 32 lanes to 128: 4x the VMEM); it also makes dK/dV plain
    # [D, BQ]x[BQ, K] MXU dots with no big in-kernel transposes.
    # dkt/dvt output windows are constant over the inner (q-block) dim:
    # the f32 blocks stay VMEM resident across it and act as accumulators,
    # flushed when the head group advances.  Only hg heads' [BQ, K]
    # transients (P, dP, dS) are live per step - the all-heads-in-kernel
    # [K, D]-layout form needs ~230 MB of VMEM at K=16384.
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dkt_ref[:] = jnp.zeros_like(dkt_ref)
        dvt_ref[:] = jnp.zeros_like(dvt_ref)

    msk = mask_ref[:].astype(jnp.float32)            # [BQ, K]
    bias = (msk - 1.0) * (-_NEG)
    for h in range(heads):
        q = q_ref[h].astype(jnp.float32) * scale     # [BQ, D] (scale folded)
        kt = kt_ref[h].astype(jnp.float32)           # [D, K]
        vt = vt_ref[h].astype(jnp.float32)
        do = do_ref[h].astype(jnp.float32)           # [BQ, D]
        logits = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [BQ, K]
        logits = logits * msk + bias
        m = logits.max(-1, keepdims=True)
        p = jnp.exp(logits - m) * msk
        l = jnp.maximum(p.sum(-1, keepdims=True), 1e-20)
        P = p / l                                    # softmax probs
        dP = jax.lax.dot_general(
            do, vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [BQ, K]
        delta = (P * dP).sum(-1, keepdims=True)      # rowsum(P o dP)
        dS = P * (dP - delta)                        # [BQ, K]
        dq_ref[h] = (jax.lax.dot_general(
            dS, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
        dkt_ref[h] += jax.lax.dot_general(
            q, dS, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (q*scale)^T @ dS
        dvt_ref[h] += jax.lax.dot_general(
            do, P, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # dO^T @ P


def _flash_bwd(num_heads, block_q, interpret, res, g):
    q, k, v, allowed = res
    qh, kh, vh, msk, dims = _pack(q, k, v, allowed, num_heads, block_q)
    Q, K, H, D, BQ, Qp, Kp = dims
    gh = _split_heads(g.astype(q.dtype), Qp, H, D)
    kt = kh.transpose(0, 2, 1)      # [H, D, Kp]: K on the lane axis
    vt = vh.transpose(0, 2, 1)
    hg = 2 if H % 2 == 0 else 1     # heads per grid step
    dq, dkt, dvt = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=hg, scale=1.0 / (D ** 0.5),
                          nblocks=Qp // BQ),
        grid=(H // hg, Qp // BQ),
        in_specs=[
            pl.BlockSpec((hg, BQ, D), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg, D, Kp), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg, D, Kp), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, Kp), lambda h, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg, BQ, D), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((hg, BQ, D), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg, D, Kp), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg, D, Kp), lambda h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, Qp, D), q.dtype),
            jax.ShapeDtypeStruct((H, D, Kp), jnp.float32),
            jax.ShapeDtypeStruct((H, D, Kp), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qh, kt, vt, msk, gh)

    dq_m = dq.transpose(1, 0, 2).reshape(-1, H * D)[:Q].astype(q.dtype)
    dk_m = dkt.transpose(2, 0, 1).reshape(-1, H * D)[:K].astype(k.dtype)
    dv_m = dvt.transpose(2, 0, 1).reshape(-1, H * D)[:K].astype(v.dtype)
    d_allowed = np.zeros(allowed.shape, dtype=jax.dtypes.float0)
    return (dq_m, dk_m, dv_m, d_allowed)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_sparse(q, k, v, allowed, num_heads, block_q, block_k, interpret):
    qh, kh, vh, msk, dims = _pack(q, k, v, allowed, num_heads, block_q,
                                  k_align=block_k)
    Q, K, H, D, BQ, Qp, Kp = dims
    out, _, _ = _sparse_fwd_call(qh, kh, vh, msk, dims, block_k, interpret)
    return out.transpose(1, 0, 2).reshape(Qp, H * D)[:Q]


def _flash_sparse_fwd(q, k, v, allowed, num_heads, block_q, block_k,
                      interpret):
    qh, kh, vh, msk, dims = _pack(q, k, v, allowed, num_heads, block_q,
                                  k_align=block_k)
    Q, K, H, D, BQ, Qp, Kp = dims
    out, m, l = _sparse_fwd_call(qh, kh, vh, msk, dims, block_k, interpret)
    primal = out.transpose(1, 0, 2).reshape(Qp, H * D)[:Q]
    return primal, (q, k, v, allowed, out, m, l)


def _sparse_bwd_kernel(count_ref, idx_ref, q_ref, ktb_ref, vtb_ref,
                       mskb_ref, do_ref, m_ref, l_ref, delta_ref,
                       dq_ref, dktb_ref, dvtb_ref, *, heads: int,
                       scale: float, nK: int):
    # Grid (H/hg, nQ): head groups outermost so the block-major dK/dV f32
    # accumulators [nK, hg, D, BK] stay VMEM-resident across all q-blocks
    # and flush once per head group.  Single pass per active k-block: the
    # forward's saved (m, l) stats reconstruct P without a stats pass, and
    # delta = rowsum(dO o O) comes in precomputed (XLA side).
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dktb_ref[:] = jnp.zeros_like(dktb_ref)
        dvtb_ref[:] = jnp.zeros_like(dvtb_ref)

    cnt = count_ref[i]
    for h in range(heads):
        q = q_ref[h].astype(jnp.float32) * scale          # [BQ, D]
        do = do_ref[h].astype(jnp.float32)                # [BQ, D]
        m = m_ref[h]                                      # [BQ, 1]
        linv = 1.0 / jnp.maximum(l_ref[h], 1e-20)
        delta = delta_ref[h]                              # [BQ, 1]
        BQ, D = q.shape

        def body(s, dq_acc):
            b = idx_ref[i * nK + s]
            kt = ktb_ref[b, h].astype(jnp.float32)        # [D, BK]
            vt = vtb_ref[b, h].astype(jnp.float32)
            msk = mskb_ref[b].astype(jnp.float32)         # [BQ, BK]
            logits = jax.lax.dot_general(
                q, kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = logits * msk + (msk - 1.0) * (-_NEG)
            P = jnp.exp(logits - m) * msk * linv          # [BQ, BK]
            dP = jax.lax.dot_general(
                do, vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [BQ, BK]
            dS = P * (dP - delta)
            dktb_ref[b, h] += jax.lax.dot_general(
                q, dS, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [D, BK]
            dvtb_ref[b, h] += jax.lax.dot_general(
                do, P, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dq_acc + jax.lax.dot_general(
                dS, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [BQ, D]

        dq = jax.lax.fori_loop(0, cnt, body,
                               jnp.zeros((BQ, D), jnp.float32))
        dq_ref[h] = (dq * scale).astype(dq_ref.dtype)


def _flash_sparse_bwd(num_heads, block_q, block_k, interpret, res, g):
    q, k, v, allowed, out_h, m, l = res
    qh, kh, vh, msk, dims = _pack(q, k, v, allowed, num_heads, block_q,
                                  k_align=block_k)
    Q, K, H, D, BQ, Qp, Kp = dims
    BK = block_k
    nQ, nK = Qp // BQ, Kp // BK
    gh = _split_heads(g.astype(q.dtype), Qp, H, D)        # [H, Qp, D]
    ktb = kh.reshape(H, nK, BK, D).transpose(1, 0, 3, 2)  # [nK, H, D, BK]
    vtb = vh.reshape(H, nK, BK, D).transpose(1, 0, 3, 2)
    mskb = msk.reshape(Qp, nK, BK).transpose(1, 0, 2)
    counts, active_idx = _sparse_blocks(msk, dims, BK)
    # delta = rowsum(dO o O) per head (== rowsum(P o dP))
    delta = (gh.astype(jnp.float32) * out_h.astype(jnp.float32)
             ).sum(-1, keepdims=True)                      # [H, Qp, 1]
    hg = 2 if H % 2 == 0 else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(H // hg, nQ),
        in_specs=[
            pl.BlockSpec((hg, BQ, D), lambda h, i, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nK, hg, D, BK), lambda h, i, *_: (0, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nK, hg, D, BK), lambda h, i, *_: (0, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nK, BQ, BK), lambda h, i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg, BQ, D), lambda h, i, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg, BQ, 1), lambda h, i, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg, BQ, 1), lambda h, i, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg, BQ, 1), lambda h, i, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((hg, BQ, D), lambda h, i, *_: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nK, hg, D, BK), lambda h, i, *_: (0, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nK, hg, D, BK), lambda h, i, *_: (0, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dq, dktb, dvtb = pl.pallas_call(
        functools.partial(_sparse_bwd_kernel, heads=hg,
                          scale=1.0 / (D ** 0.5), nK=nK),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((H, Qp, D), q.dtype),
            jax.ShapeDtypeStruct((nK, H, D, BK), jnp.float32),
            jax.ShapeDtypeStruct((nK, H, D, BK), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(counts, active_idx, qh, ktb, vtb, mskb, gh, m, l, delta)

    dq_m = dq.transpose(1, 0, 2).reshape(-1, H * D)[:Q].astype(q.dtype)
    dk_m = dktb.transpose(0, 3, 1, 2).reshape(Kp, H * D)[:K].astype(k.dtype)
    dv_m = dvtb.transpose(0, 3, 1, 2).reshape(Kp, H * D)[:K].astype(v.dtype)
    d_allowed = np.zeros(allowed.shape, dtype=jax.dtypes.float0)
    return (dq_m, dk_m, dv_m, d_allowed)


_flash_sparse.defvjp(_flash_sparse_fwd, _flash_sparse_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_mixed(q, k, v, allowed, num_heads, block_q, block_k, interpret):
    """Block-sparse FORWARD + dense one-shot BACKWARD.

    Both kernels compute exact masked attention, so pairing them is
    valid; the sparse grid wins the forward at every measured shape
    while the sparse backward's block-list loop + block-major
    accumulators lose to the dense [BQ, K] backward at DN-padded
    training query counts (see masked_flash_attention)."""
    qh, kh, vh, msk, dims = _pack(q, k, v, allowed, num_heads, block_q,
                                  k_align=block_k)
    Q, K, H, D, BQ, Qp, Kp = dims
    out, _, _ = _sparse_fwd_call(qh, kh, vh, msk, dims, block_k, interpret)
    return out.transpose(1, 0, 2).reshape(Qp, H * D)[:Q]


def _flash_mixed_fwd(q, k, v, allowed, num_heads, block_q, block_k,
                     interpret):
    return (_flash_mixed(q, k, v, allowed, num_heads, block_q, block_k,
                         interpret), (q, k, v, allowed))


def _flash_mixed_bwd(num_heads, block_q, block_k, interpret, res, g):
    return _flash_bwd(num_heads, block_q, interpret, res, g)


_flash_mixed.defvjp(_flash_mixed_fwd, _flash_mixed_bwd)
