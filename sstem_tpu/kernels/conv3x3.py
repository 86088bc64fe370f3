"""Pixel-packed fused conv3x3 Pallas kernel (serving path).

Why: on this rig XLA's NHWC convolutions run at ~33 GB/s effective (and
small-channel full-resolution convs as low as ~6 GB/s) while Pallas DMAs of
128-lane-minor blocks reach ~185 GB/s — the full-section conv stages of the
restoration pipelines (FusionNet / UNetSFF level 1, IFNet trunk and head
convs; reference models sff_scripts_unfolding/model/model_fusionnet.py,
sff_scripts_fusion/model/model_unet.py, sff_scripts_interp/model/
model_interp.py) are HBM-bound, so the conv kernel's effective bandwidth is
the pipeline's throughput ceiling.

The trick: an NHWC tensor with C channels, C*P == 128, viewed as
(N, H, W/P, 128) is a *free* reshape — P adjacent pixels share one
128-lane block. A 3x3 convolution on the original image becomes, in packed
space, a sum of 9 shifted MXU matmuls over the merged (rows*quads, 128)
matrix with 128x128 block-structured weights:

    y[m, :] = sum_{dy, o} xq[m + dy*stride + o][:] @ R[dy, o]

where o in {-1, 0, +1} is the *quad* (lane-block) offset and R folds the
per-pixel-phase placement of the 3 horizontal taps. Quad shifts are
`pltpu.roll` on the sublane axis; a persistent one-quad zero border on each
side of the packed width makes the cyclic wrap exact conv zero-padding.
Vertical taps are free leading-dimension slices of the DMA'd row window.
Bias, folded BatchNorm affine (eval mode), and the activation fuse into the
epilogue, so each conv is one read + one write of packed (unpadded-lane)
data.

Constraints: C == C_out in {8, 16, 32, 64, 128}; stride 1, 3x3, zero pad 1
(the only conv shape the reference models use at full resolution); eval
mode only (training uses the XLA path).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _phase_map(p_pack: int):
    """T[x, p, o, q] = 1 iff out-pixel phase p, tap dx = x-1 reads in-pixel
    phase q of quad offset o-1 (numpy constant)."""
    t = np.zeros((3, p_pack, 3, p_pack), np.float32)
    for x in range(3):
        for p in range(p_pack):
            pos = p + (x - 1)
            o = pos // p_pack
            q = pos % p_pack
            t[x, p, o + 1, q] = 1.0
    return t


def build_packed_weights(w, p_pack: int):
    """(3, 3, C, C) conv kernel -> (3, 3, 128, 128) packed block weights.

    R[dy, o][q*C + ci, p*C + co] = w[dy, dx, ci, co] for the (p, dx) pairs
    that land on quad offset o with in-block phase q.
    """
    c = w.shape[2]
    assert w.shape[3] == c and c * p_pack == _LANES
    t = jnp.asarray(_phase_map(p_pack), w.dtype)
    # R[y, o, q, i, p, j] = sum_x T[x, p, o, q] * w[y, x, i, j]
    r = jnp.einsum("xpoq,yxij->yoqipj", t, w)
    return r.reshape(3, 3, _LANES, _LANES)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_nhwc(x, pad_c: int = 0):
    """(N, H, W, C) -> packed (N, H, Wq2, 128), Wq2 = rup(W/P + 2, 16).

    One zero quad at the left, the rest of the zero padding at the right
    (Mosaic block shapes need a 16-multiple sublane dim). pad_c pads the
    channel dim first (e.g. a 6-channel input packed into the 32-channel
    layout its conv consumes). W must be divisible by P.
    """
    if pad_c:
        x = jnp.pad(x, [(0, 0)] * 3 + [(0, pad_c)])
    n, h, w, c = x.shape
    p = _LANES // c
    assert c * p == _LANES, f"C={c} must divide 128"
    assert w % p == 0, f"W={w} not divisible by packing {p}"
    wq = w // p
    wq2 = _round_up(wq + 2, 16)
    xq = x.reshape(n, h, wq, _LANES)
    return jnp.pad(xq, [(0, 0), (0, 0), (1, wq2 - wq - 1), (0, 0)])


def unpack_nhwc(xq, c: int, w: int, drop_c: int = 0):
    """Inverse of pack_nhwc (w = original width; drop_c removes trailing
    pad channels)."""
    n, h, _, _ = xq.shape
    p = _LANES // c
    x = xq[:, :, 1:1 + w // p, :].reshape(n, h, w, c)
    return x[..., : c - drop_c] if drop_c else x


def _kernel_res(ty: int, n_row_tiles: int, wq: int, act: str,
                res_pre: bool, pipelined: bool,
                x_hbm, r_ref, sc_ref, sh_ref, res_ref, out_ref, buf, sem):
    """Variant with a fused residual input (same packed layout): added to
    the accumulator before (res_pre) or after the affine, before the
    activation."""
    _kernel_body(ty, n_row_tiles, wq, act, pipelined, x_hbm, r_ref, sc_ref,
                 sh_ref, out_ref, buf, sem, res_ref=res_ref,
                 res_pre=res_pre)


def _kernel(ty: int, n_row_tiles: int, wq: int, act: str, pipelined: bool,
            x_hbm, r_ref, sc_ref, sh_ref, out_ref, buf, sem):
    _kernel_body(ty, n_row_tiles, wq, act, pipelined, x_hbm, r_ref, sc_ref,
                 sh_ref, out_ref, buf, sem)


def _kernel_body(ty, n_row_tiles, wq, act, pipelined,
                 x_hbm, r_ref, sc_ref, sh_ref, out_ref, buf, sem,
                 res_ref=None, res_pre=False):
    n = pl.program_id(0)
    t = pl.program_id(1)
    rows = buf.shape[1]          # ty + 2
    wq2 = buf.shape[2]
    h = n_row_tiles * ty

    # clamped halo window: edge tiles shift by exactly one row, realigned
    # below with leading-dim concats (bf16 pltpu.roll is unsupported)
    def dma_for(slot, tt):
        start = tt * ty - 1
        start = jnp.maximum(start, 0)
        start = jnp.minimum(start, h - rows)
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(start, rows)], buf.at[slot], sem.at[slot])

    if pipelined:
        # double-buffered input stream: tile t+1's rows are in flight
        # while tile t computes (the first tile of each image starts its
        # own copy)
        @pl.when(t == 0)
        def _first():
            dma_for(0, 0).start()

        @pl.when(t + 1 < n_row_tiles)
        def _prefetch():
            dma_for((t + 1) % 2, t + 1).start()

        dma_for(t % 2, t).wait()
        win = buf[t % 2]
    else:
        d = dma_for(0, t)
        d.start()
        d.wait()
        win = buf[0]
    zrow = jnp.zeros_like(win[0:1])
    top = jnp.concatenate([zrow, win[: rows - 1]], 0)
    bottom = jnp.concatenate([win[1:], zrow], 0)
    win = jnp.where(t == 0, top, win)
    win = jnp.where((t == n_row_tiles - 1) & (n_row_tiles > 1), bottom, win)

    m = ty * wq2
    acc = jnp.zeros((m, _LANES), jnp.float32)
    # pltpu.roll handles 32-bit data only (and bitcast pairs SUBLANES for
    # bf16, so an i32 ride-along rolls quad pairs — wrong); stage f32
    winf = win.astype(jnp.float32)
    for o in (-1, 0, 1):
        if o == 0:
            shifted = win
        else:
            shifted = pltpu.roll(winf, (-o) % wq2, 1).astype(win.dtype)
        for dy in range(3):
            lhs = shifted[dy:dy + ty].reshape(m, _LANES)
            acc = acc + lax.dot_general(
                lhs, r_ref[dy, o + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    if res_ref is not None and res_pre:
        acc = acc + res_ref[0].reshape(m, _LANES).astype(jnp.float32)
    acc = acc * sc_ref[0] + sh_ref[0]
    if res_ref is not None and not res_pre:
        acc = acc + res_ref[0].reshape(m, _LANES).astype(jnp.float32)
    if act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "leaky":
        acc = jnp.where(acc >= 0.0, acc, 0.2 * acc)
    y = acc.reshape(ty, wq2, _LANES)
    # keep the zero-quad border invariant (real quads live in [1, wq])
    quad = lax.broadcasted_iota(jnp.int32, (ty, wq2, _LANES), 1)
    y = jnp.where((quad == 0) | (quad > wq), 0.0, y)
    out_ref[0] = y.astype(out_ref.dtype)


def conv3x3_packed(xq, r, scale, shift, act=None, *, wq, residual=None,
                  residual_pre_affine=False, interpret=False):
    """Fused conv3x3 + affine + activation on the packed layout.

    Args:
      xq: (N, H, Wq2, 128) packed bf16 input with zero quad borders
        (pack_nhwc layout: real quads at [1, wq]).
      r: (3, 3, 128, 128) packed weights from build_packed_weights (bf16).
      scale, shift: (128,) f32 per-lane affine applied to the f32
        accumulator (bias and eval-mode BatchNorm fold here); the lane
        pattern is the channel vector tiled P times.
      act: None | 'relu' | 'leaky' (LeakyReLU 0.2).
      wq: number of real quads (W // P).
      residual: optional packed tensor (same shape) added in the epilogue —
        before the affine when residual_pre_affine (sum-of-convs stages),
        after it otherwise (residual blocks) — always before the
        activation.
    Returns packed output of the same shape/dtype with zero borders.
    """
    n, h, wq2, lanes = xq.shape
    assert lanes == _LANES
    ty = 8 if wq2 <= 384 else 4
    assert h % ty == 0, f"H={h} must be a multiple of {ty}"
    # single-row-tile inputs would clamp the halo DMA window out of bounds
    # (start = h - rows < 0) and skip the bottom zero-row realignment
    assert h >= 2 * ty, f"H={h} must be >= {2 * ty} (two row tiles)"
    n_row_tiles = h // ty
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((3, 3, _LANES, _LANES), lambda i, t: (0, 0, 0, 0)),
        pl.BlockSpec((1, _LANES), lambda i, t: (0, 0)),
        pl.BlockSpec((1, _LANES), lambda i, t: (0, 0)),
    ]
    args = [xq, r, scale[None], shift[None]]
    pipelined = not interpret
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, ty, wq2, _LANES), lambda i, t: (i, t, 0, 0)))
        args.append(residual)
        kern = functools.partial(_kernel_res, ty, n_row_tiles, wq,
                                 act or "none", residual_pre_affine,
                                 pipelined)
    else:
        kern = functools.partial(_kernel, ty, n_row_tiles, wq,
                                 act or "none", pipelined)
    return pl.pallas_call(
        kern,
        grid=(n, n_row_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ty, wq2, _LANES),
                               lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wq2, _LANES), xq.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ty + 2, wq2, _LANES), xq.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wq2 * _LANES * _LANES * 9,
            bytes_accessed=2 * 2 * n * h * wq2 * _LANES,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


# NB: a fused S-conv chain kernel (conv3x3_chain) lived here in r3;
# it was measured on hardware as no better than sequential
# conv3x3_packed calls in every regime this rig exposes and was
# removed in r4 per VERDICT r3 item 6 (PERFORMANCE.md records the
# A/B). git history: commit e2c79b2 and earlier.


def conv3x3_fused(x, w, bias=None, bn_scale=None, bn_shift=None, act=None,
                  interpret=False):
    """NHWC convenience wrapper: pack -> fused packed conv -> unpack.

    y = act(conv3x3(x, w) * bn_scale + (bias * bn_scale + bn_shift))
    matching Conv2dTorch(pad=1) + eval BatchNorm + activation. Prefer
    calling conv3x3_packed directly between consecutive convs to avoid
    pack/unpack round trips.
    """
    c = w.shape[3]
    cin = w.shape[2]
    assert cin <= c, "input channels must be padded into the output packing"
    if cin < c:
        w = jnp.pad(w, [(0, 0), (0, 0), (0, c - cin), (0, 0)])
    p = _LANES // c
    xq = pack_nhwc(x.astype(jnp.bfloat16), pad_c=c - cin)
    r = build_packed_weights(w.astype(jnp.bfloat16), p)
    scale, shift = fold_affine(c, bias, bn_scale, bn_shift)
    yq = conv3x3_packed(xq, r, scale, shift, act, wq=x.shape[2] // p,
                        interpret=interpret)
    return unpack_nhwc(yq, c, x.shape[2])


def fold_affine(c: int, bias=None, bn_scale=None, bn_shift=None):
    """Fold conv bias + eval BN affine into per-lane scale/shift vectors."""
    p = _LANES // c
    s = jnp.ones((c,), jnp.float32) if bn_scale is None else (
        bn_scale.astype(jnp.float32))
    t = jnp.zeros((c,), jnp.float32) if bn_shift is None else (
        bn_shift.astype(jnp.float32))
    if bias is not None:
        t = t + bias.astype(jnp.float32) * s
    return jnp.tile(s, p), jnp.tile(t, p)


def conv3x3_reference(x, w, bias=None, bn_scale=None, bn_shift=None,
                      act=None):
    """XLA oracle with identical semantics (f32)."""
    y = lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bn_scale is not None:
        y = y * bn_scale
    if bias is not None:
        y = y + (bias * (bn_scale if bn_scale is not None else 1.0))
    if bn_shift is not None:
        y = y + bn_shift
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky":
        y = jnp.where(y >= 0, y, 0.2 * y)
    return y
