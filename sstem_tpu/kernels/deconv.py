"""Pixel-packed fused ConvTranspose2d(k3, s2, p1, op1) Pallas kernel.

The reference decoders upsample with ConvTranspose2d(kernel 3, stride 2,
padding 1, output_padding 1) — exactly 2x (model_fusionnet.py:83-87,
model_unet.py:60-66). Per output parity the transposed conv collapses to at
most 2 taps per axis:

    out[2i]   = w1 . x[i]            out[2i+1] = w0 . x[i] + w2 . x[i+1]

so on the packed layout (kernels/conv3x3.py) a halved-channel 2x deconv
(C_in -> C_out = C_in/2 doubles the pixels per 128-lane block, keeping the
quad count IDENTICAL) is 6 MXU matmuls per row tile with block-structured
weights, plus the eval-BatchNorm affine and activation fused into the
epilogue — one read of the low-res tensor, one write of the high-res one.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sstem_tpu.kernels.conv3x3 import _LANES


def build_packed_deconv_weights(w, c_in: int):
    """(3, 3, C_out, C_in) torch-layout deconv kernel -> packed R.

    Returns (2, 2, 2, 128, 128): [out-row parity a, row tap offset ro,
    quad offset co] block matrices mapping in-lanes (pi*C_in + ci) to
    out-lanes (p_out*C_out + co_). C_out = C_in // 2.
    """
    c_out = w.shape[2]
    assert w.shape[3] == c_in and c_out * 2 == c_in
    p_in = _LANES // c_in
    p_out = 2 * p_in
    wf = jnp.flip(w, axis=(0, 1))  # ConvTranspose applies the flipped kernel
    r = jnp.zeros((2, 2, 2, _LANES, _LANES), w.dtype)
    for a in range(2):
        row_taps = [(0, 1)] if a == 0 else [(0, 0), (1, 2)]
        for p in range(p_out):
            pi, b = p // 2, p % 2
            col_taps = ([(pi, 0, 1)] if b == 0 else
                        [(pi, 0, 0),
                         ((pi + 1) % p_in, (pi + 1) // p_in, 2)])
            for ro, ridx in row_taps:
                for qphase, co_off, cidx in col_taps:
                    # R[a, ro, co_off][qphase*C_in + ci, p*C_out + o]
                    #   += wf[ridx, cidx, o, ci]
                    blk = jnp.transpose(wf[ridx, cidx])  # (ci, o)
                    r = r.at[
                        a, ro, co_off,
                        qphase * c_in:(qphase + 1) * c_in,
                        p * c_out:(p + 1) * c_out,
                    ].add(blk)
    return r


def _kernel(n_in_rows: int, wq: int, act: str, res_mode: str,
            pipelined: bool,
            x_hbm, r_ref, sc_ref, sh_ref, *rest):
    if res_mode != "none":
        res_ref, out_ref, buf, sem = rest
    else:
        out_ref, buf, sem = rest
        res_ref = None
    t = pl.program_id(1)
    n = pl.program_id(0)
    wq2 = buf.shape[2]
    rows = buf.shape[1]  # 5 = 4 in rows + 1 bottom tap row
    n_tiles = pl.num_programs(1)

    def dma_for(slot, tt):
        start = jnp.minimum(4 * tt, n_in_rows - rows)
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(start, rows)], buf.at[slot], sem.at[slot])

    if pipelined:
        @pl.when(t == 0)
        def _first():
            dma_for(0, 0).start()

        @pl.when(t + 1 < n_tiles)
        def _prefetch():
            dma_for((t + 1) % 2, t + 1).start()

        dma_for(t % 2, t).wait()
        win = buf[t % 2]
    else:
        d = dma_for(0, t)
        d.start()
        d.wait()
        win = buf[0]
    # bottom tile: the clamped window sits one row high; realign and feed
    # zeros to the out-of-range x[i+1] taps of the final output row
    zrow = jnp.zeros_like(win[0:1])
    shifted = jnp.concatenate([win[1:], zrow], 0)
    last = t == (pl.num_programs(1) - 1)
    win = jnp.where(last & (n_in_rows > 4), shifted, win)

    m = 4 * wq2
    winf = win.astype(jnp.float32)
    outs = []
    for a in range(2):
        acc = jnp.zeros((m, _LANES), jnp.float32)
        for co in (0, 1):
            if co == 0:
                s_win = win
            else:
                s_win = pltpu.roll(winf, wq2 - 1, 1).astype(win.dtype)
            for ro in range(2):
                if a == 0 and ro == 1:
                    continue
                lhs = s_win[ro:ro + 4].reshape(m, _LANES)
                acc = acc + lax.dot_general(
                    lhs, r_ref[a, ro, co],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        acc = acc * sc_ref[0] + sh_ref[0]
        y = acc.reshape(4, wq2, _LANES)
        outs.append(y)

    y = jnp.stack(outs, axis=1).reshape(8, wq2, _LANES)
    if res_ref is not None:
        res = res_ref[0].astype(jnp.float32)
        if res_mode == "post_affine":
            y = y + res
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky":
        y = jnp.where(y >= 0.0, y, 0.2 * y)
    if res_ref is not None and res_mode == "post_act_half":
        y = (y + res_ref[0].astype(jnp.float32)) * 0.5
    quad = lax.broadcasted_iota(jnp.int32, (8, wq2, _LANES), 1)
    y = jnp.where((quad == 0) | (quad > wq), 0.0, y)
    out_ref[0] = y.astype(out_ref.dtype)


def deconv2x_packed(xq, r, scale, shift, act=None, *, wq, residual=None,
                    res_mode="post_affine", interpret=False):
    """Fused 2x transposed conv + affine + act on the packed layout.

    Args:
      xq: (N, H, Wq2, 128) packed input (P_in pixels x C_in channels).
      r: (2, 2, 2, 128, 128) from build_packed_deconv_weights.
      scale, shift: (128,) f32 per-OUT-lane affine (bias + eval BN).
      residual: optional packed (N, 2H, Wq2, 128) tensor;
        res_mode 'post_affine' adds it before the activation,
        'post_act_half' computes (act(y) + residual) / 2 (the FusionNet
        skip (deconv_block(x) + down) / 2).
    Returns (N, 2H, Wq2, 128) packed at P_out = 2 P_in (C_out = C_in / 2).
    """
    n, h, wq2, lanes = xq.shape
    assert lanes == _LANES
    assert h % 4 == 0 and h >= 8, f"H_in={h} must be a multiple of 4, >= 8"
    grid = (n, h // 4)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((2, 2, 2, _LANES, _LANES),
                     lambda i, t: (0, 0, 0, 0, 0)),
        pl.BlockSpec((1, _LANES), lambda i, t: (0, 0)),
        pl.BlockSpec((1, _LANES), lambda i, t: (0, 0)),
    ]
    args = [xq, r, scale[None], shift[None]]
    mode = "none"
    if residual is not None:
        mode = res_mode
        in_specs.append(
            pl.BlockSpec((1, 8, wq2, _LANES), lambda i, t: (i, t, 0, 0)))
        args.append(residual)
    return pl.pallas_call(
        functools.partial(_kernel, h, wq, act or "none", mode,
                          not interpret),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, wq2, _LANES),
                               lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, wq2, _LANES), xq.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 5, wq2, _LANES), xq.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)


def deconv2x_reference(x, w, b, bn_scale=None, bn_shift=None, act=None):
    """XLA oracle: ConvTranspose2dTorch eval semantics + affine + act."""
    y = lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.flip(w.astype(jnp.float32), (0, 1)),
        (1, 1), padding=((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWOI", "NHWC"))
    y = y + b
    if bn_scale is not None:
        y = y * bn_scale + bn_shift
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky":
        y = jnp.where(y >= 0, y, 0.2 * y)
    return y
