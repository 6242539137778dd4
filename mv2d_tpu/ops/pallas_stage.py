"""Fused ResNet bottleneck-chain band kernels (eval fast path).

The backbone's small-C stages are HBM/layout-bound under XLA on TPU: the
per-op device profile shows stage-1's 1x1 convs at ~7% and 3x3 convs at
~15% MXU (each conv round-trips the [V, 128, 352, C] activations through
HBM, and small-C convs lower tap-by-tap at half contraction depth / half
output width).  This kernel runs a CHAIN of bottleneck blocks (ref: mmdet
ResNet layers, configs/mv2d/detectors/maskrcnn_r50.py:5-14) VMEM-resident
over row bands:

  * activations live in the natural 2D [pixels(sublanes), C(lanes)] form -
    the flattened (rows, W+8) x C view of the band is relayout-free,
  * 1x1 convs are single MXU matmuls,
  * the 3x3 conv is ONE im2col matmul: the 9 shifted slices of the flat
    pixel axis are lane-concatenated into a [n, 9*planes] cols operand and
    contracted against the [9*planes, planes] stacked kernel.  At
    planes=64 this runs the MXU at K=576 (4.5 full passes) instead of the
    v1 form's nine half-depth [*, 64]@[64, 64] matmuls - 2x the useful
    MAC rate; the 64-wide output caps the ceiling at 50% regardless,
  * frozen-BN affines fold into the matmul weights/biases (the backbone's
    BN is frozen even in training, so folding is exact),
  * column zero-pads are re-applied after every bias+relu so the shifted
    taps see the conv's zero padding; band row halos (4 per side) cover
    the chain's row shrinkage (up to 3 blocks per call),
  * two chain shapes: `fused_stage1` = blocks 0..2 of layer1 (block 0
    carries the 1x1 downsample projection), `fused_identity_chain` =
    the stride-1 identity blocks 1..N-1 of any later stage (the stride-2
    block 0 stays on the XLA path).

Inference only (custom_jvp zero tangents); training keeps the XLA path.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32      # output rows per band

_OFFS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _kernel(x_ref, ws_ref, out_ref, band, sem, *, Wp: int, W: int,
            n_blocks: int, cin: int, planes: int, has_ds: bool, halo: int):
    """ws_ref: packed weight table (see _pack_weights); band: VMEM scratch
    [ROWS + 2*halo, Wp, cin]; halo = n_blocks + 1 rows per side."""
    v = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_ref.at[v, pl.ds(i * ROWS, ROWS + 2 * halo)], band, sem)
    cp.start()
    cp.wait()

    P = (ROWS + 2 * halo) * Wp
    cout = planes * 4
    x = band[:].reshape(P, cin)
    col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) % Wp
    colmask = ((col >= 4) & (col < W + 4)).astype(jnp.float32)
    m_step = Wp + 8                     # >= one row + dx shift, per conv

    def take(w_off, r, c):
        # weights ride in one packed f32 table; ref lane slices must be
        # 128-aligned, so load full rows and narrow the VALUE
        w = ws_ref[pl.ds(w_off, r), :]
        return w[:, :c] if c < w.shape[1] else w

    woff = 0

    def pop(r, c):
        nonlocal woff
        w = take(woff, r, c)
        woff += r
        return w

    cur = x.astype(jnp.float32)         # [P, cin], margin 0 (flat offset)
    cur_m = 0
    cur_c = cin
    for b in range(n_blocks):
        w1 = pop(cur_c, planes)
        b1 = pop(1, planes)
        w2 = [pop(planes, planes) for _ in range(9)]
        b2 = pop(1, planes)
        w3 = pop(planes, cout)
        b3 = pop(1, cout)
        if b == 0 and has_ds:
            wd = pop(cur_c, cout)
            bd = pop(1, cout)

        n_cur = cur.shape[0]
        # conv1 1x1 + bn + relu (+ column re-zero)
        t1 = jax.lax.dot_general(cur.astype(jnp.bfloat16),
                                 w1.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) + b1
        t1 = jnp.maximum(t1, 0.0) * colmask[cur_m:cur_m + n_cur]
        # conv2 3x3: one im2col matmul - lane-concat the 9 shifted flat
        # slices into [n2, 9*planes] and contract at full MXU depth.
        # Each slice goes through an explicit roll so all concat inputs
        # carry canonical (offset-0) sublane layouts; a plain value slice
        # keeps a static offset layout that Mosaic cannot concatenate
        # ("result/input offset mismatch on non-concat dimension").
        n2 = n_cur - 2 * m_step

        def tap(off):
            # roll requires a non-negative shift: rotate by n_cur - off
            # (same residue; the wrapped tail lands beyond n2 and is
            # never read since off + n2 <= n_cur).  Rolls run in f32
            # (Mosaic has no sub-32-bit rotate); cast per tap after.
            return pltpu.roll(t1, n_cur - off,
                              axis=0)[:n2].astype(jnp.bfloat16)

        cols = jnp.concatenate(
            [tap(m_step + dy * Wp + dx) for (dy, dx) in _OFFS],
            axis=1)                                        # [n2, 9*planes]
        w2cat = jnp.concatenate(w2, axis=0)                # [9*planes, pl]
        acc = jax.lax.dot_general(
            cols, w2cat.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2
        m2 = cur_m + m_step
        t2 = jnp.maximum(acc, 0.0) * colmask[m2:m2 + n2]
        # conv3 1x1 + bn
        t3 = jax.lax.dot_general(t2.astype(jnp.bfloat16),
                                 w3.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) + b3
        # identity / downsample
        idn = cur[m_step:m_step + n2]
        if b == 0 and has_ds:
            idn = jax.lax.dot_general(idn.astype(jnp.bfloat16),
                                      wd.astype(jnp.bfloat16),
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) \
                + bd
        cur = jnp.maximum(t3 + idn, 0.0) * colmask[m2:m2 + n2]
        cur_m = m2
        cur_c = cout

    # central ROWS x W window -> out block
    start = halo * Wp - cur_m
    y = cur[start:start + ROWS * Wp].astype(out_ref.dtype)
    y = y.reshape(ROWS, Wp, cout)
    out_ref[0] = y[:, 4:4 + W, :]


def _pack_weights(blocks, cin: int, planes: int) -> jnp.ndarray:
    """blocks: per block dict(w1, b1, w2 [3,3,planes,planes], b3, ...) with
    frozen-BN already folded.  Packs everything row-wise into ONE f32
    [rows, max(cout, 128)] table so the kernel takes a single array."""
    cout = planes * 4
    width = max(cout, 128)
    rows = []

    def put(a):
        a = jnp.asarray(a, jnp.float32)
        if a.ndim == 1:
            a = a[None, :]
        rows.append(jnp.pad(a, ((0, 0), (0, width - a.shape[1]))))

    for b, blk in enumerate(blocks):
        put(blk['w1'])
        put(blk['b1'])
        w2 = blk['w2']                     # [3, 3, planes, planes]
        for dy in range(3):
            for dx in range(3):
                put(w2[dy, dx])
        put(blk['b2'])
        put(blk['w3'])
        put(blk['b3'])
        if b == 0 and 'wd' in blk:
            put(blk['wd'])
            put(blk['bd'])
    return jnp.concatenate(rows, axis=0)


def _impl(x, ws, n_blocks, planes, has_ds, interpret):
    V, H, W, cin = x.shape
    assert H % ROWS == 0, 'input rows must tile into bands'
    cout = planes * 4
    Wp = W + 8
    halo = n_blocks + 1     # each block consumes ~(1 + 8/Wp) rows per side
    xp = jnp.pad(x, ((0, 0), (halo, halo), (4, 4), (0, 0)))
    nb = H // ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(V, nb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((ws.shape[0], ws.shape[1]),
                               lambda v, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ROWS, W, cout),
                               lambda v, i: (v, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROWS + 2 * halo, Wp, cin), x.dtype),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_kernel, Wp=Wp, W=W, n_blocks=n_blocks,
                          cin=cin, planes=planes, has_ds=has_ds, halo=halo),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((V, H, W, cout), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, ws)


@functools.lru_cache(maxsize=None)
def _make(n_blocks, planes, has_ds, interpret):
    @jax.custom_jvp
    def f(x, ws):
        return _impl(x, ws, n_blocks, planes, has_ds, interpret)

    @f.defjvp
    def _jvp(primals, tangents):
        out = f(*primals)
        return out, jnp.zeros_like(out)

    return f


def _run_chain(x: jnp.ndarray, blocks: Sequence[dict], planes: int,
               has_ds: bool, interpret: bool | None) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    cin = x.shape[-1]
    if cin % 128:
        # HBM memref slicing needs a 128-aligned minor dim: pad the input
        # channels with zeros and the first matmuls' input rows to match
        pad = 128 - cin % 128
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
        blocks = [dict(b) for b in blocks]
        blocks[0]['w1'] = jnp.pad(blocks[0]['w1'], ((0, pad), (0, 0)))
        if 'wd' in blocks[0]:
            blocks[0]['wd'] = jnp.pad(blocks[0]['wd'], ((0, pad), (0, 0)))
    ws = _pack_weights(blocks, x.shape[-1], planes)
    return _make(len(blocks), planes, has_ds, interpret)(x, ws)


def fused_stage1(x: jnp.ndarray, blocks: Sequence[dict],
                 planes: int = 64,
                 interpret: bool | None = None) -> jnp.ndarray:
    """x: [V, H, W, planes] (post-maxpool); blocks: folded per-block weights
    (see _pack_weights), block 0 carrying wd/bd.  Returns
    [V, H, W, 4*planes].  Inference only."""
    return _run_chain(x, blocks, planes, has_ds=True, interpret=interpret)


def fused_identity_chain(x: jnp.ndarray, blocks: Sequence[dict],
                         planes: int,
                         interpret: bool | None = None) -> jnp.ndarray:
    """Identity bottleneck chain (blocks 1..N-1 of a stage): x
    [V, H, W, 4*planes] -> same shape.  The stage's stride-2 block 0 stays
    on the XLA path.  Inference only."""
    return _run_chain(x, blocks, planes, has_ds=False, interpret=interpret)
