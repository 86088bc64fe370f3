"""Fused 2x align-corners upsample + conv3x3 on the packed layout.

The IFNet kernel-prediction head tail (reference model_interp.py:74-83:
``Upsample(scale=2, align_corners=True)`` then ``upconv51_*`` 3x3 conv at
FULL section resolution) is the serving pipeline's largest stable cost
(~14 ms/section/head on XLA: the 51->51 full-res conv runs in the ~33 GB/s
XLA conv regime, and a standalone packed upsample still writes + re-reads a
215 MB full-res intermediate). This kernel consumes the packed HALF-res
head feature map and emits conv3x3(upsample2x(x)) directly:

 * vertical (sublane) upsample via one-hot row-selection matmuls: output
   row y of the conv INPUT window (rows y0-1 .. y0+ty) reads half rows
   r(y) = floor(y*(Hh-1)/(H-1)) and r+1; 0/1 selection matrices are exact
   in bf16 and absorb the window's 8-alignment, and out-of-image rows get
   all-zero selector rows — exactly the conv's zero padding.
 * horizontal (lane/block) upsample stays in VMEM: with C=64 / P=2, the
   three consecutive half pixels an output block needs live in two
   adjacent input blocks; middle-axis dup views of the vertically-blended
   rows (and of their lane-swapped copy — ONE 64-lane rotate at half
   width) are combined by six precomputed per-column coefficient planes.
 * the 9-shifted-matmul conv3x3 of kernels/conv3x3.py then runs on the
   assembled (ty+2, Wq2f, 128) window; bias folds into the affine
   epilogue. One half-res read, one full-res write — the full-res
   intermediate never touches HBM.

Weight padding: the head feature map carries 64 real channels but the
reference conv3 consumes (and produces) only kernel_size of them; in- and
out-channel padding to 64 with zeros reproduces the [..., :K] slice.
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


def build_upconv_coeffs(wh: int, c: int = 64):
    """Per-column coefficient planes (6, 2*wh//2... (6, wqf, 128) f32).

    For output pixel j (block Q = j//2, slot p = j%2), the bilinear source
    is (1-wr)*X(l) + wr*X(l+1), l = floor(j*(wh-1)/(2wh-1)) clamped to
    wh-2. With K(Q) = l(2Q)//2, the six FMA sources are the dup views
    d0[Q] = z[Q//2], dm1, dp1 and their lane-swapped copies; this computes
    their per-(Q, slot) coefficients (host f64, cast f32).
    """
    w = 2 * wh
    j = np.arange(w)
    src = j * (wh - 1) / (w - 1)
    l = np.minimum(np.floor(src).astype(np.int64), wh - 2)
    wr = src - l
    q, p = j // 2, j % 2
    l0 = np.minimum(np.floor((2 * q) * (wh - 1) / (w - 1)).astype(np.int64),
                    wh - 2)
    k = l0 // 2
    b = (k == q // 2 - 1)

    def wgt(m):
        return np.where(m == l, 1.0 - wr, np.where(m == l + 1, wr, 0.0))

    d_gl = wgt(2 * k + p)          # g_left  lane (p, c) holds X(2K+p)
    d_sl = wgt(2 * k + 1 - p)      # swapped g_left: X(2K+1-p)
    d_gr = wgt(2 * k + 2 + p)
    d_sr = wgt(2 * k + 3 - p)
    bf = b.astype(np.float64)
    c_d0 = (1 - bf) * d_gl + bf * d_gr
    c_dm1 = bf * d_gl
    c_dp1 = (1 - bf) * d_gr
    c_s0 = (1 - bf) * d_sl + bf * d_sr
    c_sm1 = bf * d_sl
    c_sp1 = (1 - bf) * d_sr

    wqf = wh  # P=2: full-res block count == wh
    out = np.zeros((6, wqf, _LANES), np.float32)
    qq = np.arange(wqf)
    for idx, arr in enumerate((c_d0, c_dm1, c_dp1, c_s0, c_sm1, c_sp1)):
        # lane (slot*c + ch) of block Q gets the pixel-(2Q+slot) coefficient
        for slot in range(2):
            out[idx, :, slot * c:(slot + 1) * c] = arr[
                2 * qq + slot, None].astype(np.float32)
    return jnp.asarray(out)


def _kernel(ty, hh, wqh, wqf, wq2f, c,
            x_hbm, r_ref, sc_ref, sh_ref, cf_ref, out_ref, buf, sem):
    n = pl.program_id(0)
    t = pl.program_id(1)
    win_rows = buf.shape[0]            # 16
    h = 2 * hh
    rows = ty + 2                      # conv input rows

    sh_num = np.float32(hh - 1)
    sh_den = np.float32(h - 1)
    y0 = t * ty

    def src_row(y):
        return (y * sh_num) / sh_den

    r_first = jnp.floor(src_row(jnp.float32(jnp.maximum(y0 - 1, 0))))
    r_first = jnp.minimum(r_first, np.float32(hh - 2)).astype(jnp.int32)
    base = jnp.maximum(
        jnp.minimum((r_first // 8) * 8, hh - win_rows), 0)

    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(base, win_rows)], buf, sem)
    dma.start()
    dma.wait()
    win = buf[...]
    wq2h = win.shape[1]

    # ---- vertical upsample to the conv input rows (one-hot matmuls) ----
    jrow = lax.broadcasted_iota(jnp.int32, (rows, 1), 0).astype(
        jnp.float32) + jnp.float32(y0 - 1)
    valid = ((jrow >= 0.0) & (jrow <= np.float32(h - 1))).astype(
        jnp.float32)
    src_j = src_row(jrow)
    r_j = jnp.minimum(jnp.floor(src_j), np.float32(hh - 2))
    wv = ((src_j - r_j) * valid).reshape(rows, 1, 1)
    vmask = valid.reshape(rows, 1, 1)
    idxw = r_j - jnp.float32(base)
    iwin = lax.broadcasted_iota(jnp.int32, (rows, win_rows), 1).astype(
        jnp.float32)
    wa = ((iwin == idxw) * valid).astype(jnp.bfloat16)
    wb = ((iwin == idxw + 1.0) * valid).astype(jnp.bfloat16)

    flat = win.reshape(win_rows, wq2h * _LANES)

    def rowsel(m2):
        return lax.dot_general(
            m2, flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(rows, wq2h, _LANES)

    va = rowsel(wa)
    vb = rowsel(wb)
    z = ((1.0 - wv) * va + wv * vb) * vmask          # f32 (rows, wq2h, 128)
    zsw = pltpu.roll(z, c, 2)                        # lane slot swap

    # ---- horizontal upsample in VMEM (dup views x coefficient planes) ----
    nb = wqf // 2

    def dup(xb, lo):
        # NB: a None-mixed non-trivial slice (xb[:, lo:lo+nb, None, :])
        # lowers to a 3-D lax.gather, which Mosaic rejects ("Only 2D
        # gather is supported") — THIS was the r3 "pathological compile"
        # (the failure is instant, not slow; the one r3 attempt coincided
        # with the tunnel dying). slice_in_dim + expand_dims lower to
        # slice + broadcast_in_dim, which Mosaic handles.
        d = jnp.expand_dims(lax.slice_in_dim(xb, lo, lo + nb, axis=1), 2)
        d = jnp.broadcast_to(d, (rows, nb, 2, _LANES))
        return d.reshape(rows, 2 * nb, _LANES)

    acc = cf_ref[0] * dup(z, 1)
    acc = acc + cf_ref[1] * dup(z, 0)
    acc = acc + cf_ref[2] * dup(z, 2)
    acc = acc + cf_ref[3] * dup(zsw, 1)
    acc = acc + cf_ref[4] * dup(zsw, 0)
    acc = acc + cf_ref[5] * dup(zsw, 2)
    u = jnp.concatenate(
        [jnp.zeros((rows, 1, _LANES), jnp.float32), acc,
         jnp.zeros((rows, wq2f - wqf - 1, _LANES), jnp.float32)],
        1).astype(jnp.bfloat16)

    # ---- conv3x3 (9 shifted matmuls; kernels/conv3x3.py idiom) ----
    m = ty * wq2f
    accc = jnp.zeros((m, _LANES), jnp.float32)
    uf = u.astype(jnp.float32)
    for o in (-1, 0, 1):
        shifted = u if o == 0 else (
            pltpu.roll(uf, (-o) % wq2f, 1).astype(u.dtype))
        for dy in range(3):
            lhs = shifted[dy:dy + ty].reshape(m, _LANES)
            accc = accc + lax.dot_general(
                lhs, r_ref[dy, o + 1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    accc = accc * sc_ref[0] + sh_ref[0]
    y = accc.reshape(ty, wq2f, _LANES)
    quad = lax.broadcasted_iota(jnp.int32, y.shape, 1)
    y = jnp.where((quad == 0) | (quad > wqf), 0.0, y)
    out_ref[0] = y.astype(out_ref.dtype)


def upconv3x3_packed(xq, r, scale, shift, coeffs, *, wq_half,
                     interpret=False):
    """conv3x3(upsample2x_align_corners(x)) on the packed layout.

    Args:
      xq: (N, Hh, Wq2h, 128) packed bf16 half-res input (C=64, P=2,
        pack_nhwc layout with zero borders).
      r: (3, 3, 128, 128) packed conv weights (build_packed_weights of the
        64x64-padded kernel).
      scale, shift: (128,) f32 affine (bias folds here).
      coeffs: build_upconv_coeffs(Wh) output, Wh = 2 * wq_half.
      wq_half: real half-res block count (Wh // 2).

    Returns (N, 2*Hh, Wq2f, 128) packed bf16, Wq2f = rup(2*Wh//2 + 2, 16).
    """
    n, hh, wq2h, lanes = xq.shape
    assert lanes == _LANES
    assert hh % 8 == 0 and hh >= 16
    ty = 8
    h = 2 * hh
    wh = 2 * wq_half
    wqf = wh
    wq2f = _round_up(wqf + 2, 16)
    kern = functools.partial(_kernel, ty, hh, wq_half, wqf, wq2f, 64)
    return pl.pallas_call(
        kern,
        grid=(n, h // ty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((3, 3, _LANES, _LANES), lambda i, t: (0, 0, 0, 0)),
            pl.BlockSpec((1, _LANES), lambda i, t: (0, 0)),
            pl.BlockSpec((1, _LANES), lambda i, t: (0, 0)),
            pl.BlockSpec((6, wqf, _LANES), lambda i, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ty, wq2f, _LANES),
                               lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wq2f, _LANES), xq.dtype),
        scratch_shapes=[
            pltpu.VMEM((16, wq2h, _LANES), xq.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xq, r, scale[None], shift[None], coeffs)
