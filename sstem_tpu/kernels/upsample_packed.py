"""Pixel-packed 2x align-corners bilinear upsample (serving path).

Why: the IFNet kernel-prediction heads end in upsample2x + conv3x3 at FULL
section resolution (reference model_interp.py:74-83 ``Upsample(align_corners
=True)`` + ``upconv51_*``), which on XLA costs ~14 ms/section per head in
planar form (the 51->51 conv runs in the ~33 GB/s XLA conv regime). Packing
keeps the whole head tail on the ~150+ GB/s Pallas path: head conv0-2
(packed) -> THIS kernel (packed half-res -> packed full-res) ->
conv3x3_packed with 51->64-padded weights -> one unpack/transpose for the
planar sepconv tap maps.

Layout contract (kernels/conv3x3.pack_nhwc): (N, H, Wq2, 128) with C=64,
P=2 adjacent pixels per 128-lane block (lane = p*64 + c), a zero quad at
block 0 and real blocks [1, wq].

Decomposition (separable, exact):
 * vertical: out row y reads half rows r(y) = floor(y*(Hh-1)/(H-1)) and
   r+1 with weight w = src - r. The 16-row DMA window is 8-aligned; a
   DYNAMIC sublane roll aligns it to r(y0), then the per-row gather is a
   masked select over three static row patterns (j//2 - 1, j//2, (j+1)//2
   — the align-corners drift never exceeds one row inside an 8-row tile),
   built from sublane dup/concat. Row indices, masks, and weights all come
   from in-kernel iota arithmetic (no host tables); (y*639)/1279-style f32
   mul/div is exact enough (products < 2^24, |src - int| >= 1/1279 away
   from floor boundaries except at exact integers).
 * horizontal: out block Q needs three consecutive half pixels starting at
   2*K(Q), K(Q) = l(2(Q-1))//2 — i.e. input blocks K and K+1, selected
   from middle-axis dup/shift candidates; four lane-permute matmuls
   (E_s: lane (s, c) -> lanes (0, c) and (1, c)) expose the four half
   pixels X(2K..2K+3) at both output slots, and the bilinear blend is a
   per-lane coefficient select over them.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x, m):
    return -(-x // m) * m


def build_slot_maps(c: int):
    """E_0, E_1: (128, 128) f32 0/1 matrices; E_s routes lane (s*c + ch)
    to lanes (0*c + ch) and (1*c + ch)."""
    p = _LANES // c
    assert p == 2, "packed upsample needs P == 2 (C == 64)"
    es = np.zeros((2, _LANES, _LANES), np.float32)
    for s in range(2):
        for ch in range(c):
            es[s, s * c + ch, ch] = 1.0
            es[s, s * c + ch, c + ch] = 1.0
    return jnp.asarray(es[0]), jnp.asarray(es[1])


def _kernel(ty, n_row_tiles, hh, wqh, wqf, wq2f, c,
            x_hbm, e0_ref, e1_ref, out_ref, buf, sem):
    t = pl.program_id(1)
    win_rows = buf.shape[0]       # 16
    h = 2 * hh

    sh = np.float32(hh - 1)       # vertical scale numerator
    sd = np.float32(h - 1)

    def src_row(y_f32):
        return (y_f32 * sh) / sd

    y0 = t * ty
    r0 = jnp.floor(src_row(jnp.float32(y0))).astype(jnp.int32)
    r0 = jnp.minimum(r0, hh - 2)
    base = jnp.maximum(jnp.minimum((r0 // 8) * 8, hh - win_rows), 0)

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(base, win_rows)], buf, sem)
    dma.start()
    dma.wait()
    win = buf[...]

    # ---- vertical blend at half-res columns ----
    # one-hot selection matmuls over the window rows: row j of the output
    # reads window rows r(y0+j)-base and +1. 0/1 matrices are exact in
    # bf16 (single nonzero per row, f32 accumulation), and the matmul
    # absorbs the window's 8-alignment offset, so no dynamic rotate and
    # no staged f32 window copy are needed.
    jrow = lax.broadcasted_iota(jnp.int32, (ty, 1), 0).astype(jnp.float32)
    src_j = src_row(jnp.float32(y0) + jrow)
    r_j = jnp.minimum(jnp.floor(src_j), np.float32(hh - 2))
    wv = (src_j - r_j).reshape(ty, 1, 1)
    idxw = r_j - jnp.float32(base)                # window-relative index
    iwin = lax.broadcasted_iota(jnp.int32, (ty, win_rows), 1).astype(
        jnp.float32)
    wa = (iwin == idxw).astype(jnp.bfloat16)
    wb = (iwin == idxw + 1.0).astype(jnp.bfloat16)

    wq2h = win.shape[1]
    flat = win.reshape(win_rows, wq2h * _LANES)

    def rowsel(m2):
        return lax.dot_general(
            m2, flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(ty, wq2h, _LANES)

    va = rowsel(wa)
    vb = rowsel(wb)
    yv = ((1.0 - wv) * va + wv * vb).astype(jnp.bfloat16)  # (ty, wq2h, 128)

    # ---- horizontal expansion to full-res blocks ----
    # candidates: D[Q] = yv[(Q-1)//2 + 1], shifted variants for K drift
    nb = wqf // 2                                  # real half-res blocks

    def dup_blocks(xb):
        d = jnp.broadcast_to(xb[:, :, None, :], (ty, nb, 2, _LANES))
        return d.reshape(ty, 2 * nb, _LANES)

    d0 = dup_blocks(yv[:, 1:nb + 1])               # in[(Q-1)//2 + 1]
    dm1 = dup_blocks(yv[:, 0:nb])                  # in[(Q-1)//2]
    dp1 = dup_blocks(yv[:, 2:nb + 2])              # in[(Q-1)//2 + 2]

    qio = lax.broadcasted_iota(jnp.int32, (1, wqf, 1), 1).astype(jnp.float32)  # Q-1
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, _LANES), 2).astype(jnp.float32)
    slot = jnp.floor(lane / np.float32(c))         # p in {0, 1}
    sw = np.float32(wqf - 1)                       # = Wh - 1... scale num
    swd = np.float32(2 * wqf - 1)

    def src_col(j):
        return (j * sw) / swd

    j0 = 2.0 * qio
    l0 = jnp.minimum(jnp.floor(src_col(j0)), np.float32(wqf - 2))
    kq = jnp.floor(l0 * 0.5)                       # K(Q) as half-block idx
    jp = j0 + slot
    srcp = src_col(jp)
    lp = jnp.minimum(jnp.floor(srcp), np.float32(wqf - 2))
    wr = srcp - lp
    i_sel = lp - 2.0 * kq                          # in {0, 1, 2}

    # K(Q) vs (Q-1)//2: drift selects the -1-shifted candidates; bf16
    # where-selects keep the working set inside the scoped-vmem limit
    qhalf = jnp.floor(qio * 0.5)
    b_shift = kq == qhalf - 1.0
    g_left = jnp.where(b_shift, dm1, d0)
    g_right = jnp.where(b_shift, d0, dp1)

    m = ty * wqf
    e0 = e0_ref[...].astype(jnp.bfloat16)
    e1 = e1_ref[...].astype(jnp.bfloat16)

    def permute(g, e):
        return lax.dot_general(
            g.reshape(m, _LANES), e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(ty, wqf, _LANES)

    def coeff(k):
        return ((i_sel == np.float32(k)) * (1.0 - wr)
                + (i_sel == np.float32(k - 1)) * wr)

    # accumulate one permuted plane at a time (vmem)
    out = coeff(0) * permute(g_left, e0)
    out = out + coeff(1) * permute(g_left, e1)
    out = out + coeff(2) * permute(g_right, e0)
    out = out + coeff(3) * permute(g_right, e1)
    out_ref[0, :, 0:1] = jnp.zeros((ty, 1, _LANES), out_ref.dtype)
    out_ref[0, :, 1:1 + wqf] = out.astype(out_ref.dtype)
    out_ref[0, :, 1 + wqf:] = jnp.zeros(
        (ty, wq2f - wqf - 1, _LANES), out_ref.dtype)


def upsample2x_packed(xq, *, c=64, wq, interpret=False):
    """(N, Hh, Wq2h, 128) packed half-res -> (N, 2*Hh, Wq2f, 128) packed
    full-res, align-corners bilinear x2 on both axes.

    Args:
      xq: packed bf16 input (pack_nhwc layout, C=c, P=2, zero borders).
      wq: real half-res block count (= Wh // 2); output has 2*wq real
        blocks. Requires C == 64 (P == 2) and Hh a multiple of 8.
    """
    n, hh, wq2h, lanes = xq.shape
    assert lanes == _LANES and c == 64
    assert hh % 8 == 0 and hh >= 16
    ty = 8
    h = 2 * hh
    wqf = 2 * wq
    wq2f = _round_up(wqf + 2, 16)
    e0, e1 = build_slot_maps(c)
    n_row_tiles = h // ty
    kern = functools.partial(_kernel, ty, n_row_tiles, hh, wq, wqf, wq2f, c)
    return pl.pallas_call(
        kern,
        grid=(n, n_row_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((_LANES, _LANES), lambda i, t: (0, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ty, wq2f, _LANES),
                               lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wq2f, _LANES), xq.dtype),
        scratch_shapes=[
            pltpu.VMEM((16, wq2h, _LANES), xq.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xq, e0, e1)
