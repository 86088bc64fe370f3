"""Fused align-corners-2x upsample + conv3 KPN head tail (Pallas, serving).

The IFNet kernel-prediction heads end with ``upsample(2x, bilinear,
align_corners=True)`` followed by a 3x3 conv K->K at FULL section
resolution (reference: sff_scripts_interp/model/model_interp.py:18,
head conv3). At 1280^2 / K=51 this pair is the single most expensive
op group of the serving pipeline (~10 ms/section/head for XLA's fused
upsample+conv, x4 heads — tools/profile_serve.py, PERFORMANCE.md r4/r5).
XLA runs it at ~4% MXU utilization because the align-corners gather and
the 51-channel planar conv both fight the (8, 128) register tiling.

TPU-first design (no reference analog — the reference runs cuDNN):

* **Phase decomposition kills the gather.** For exact-2x align_corners,
  output column 2j reads inputs {j-1, j} and column 2j+1 reads {j, j+1}
  (the fractional source position drifts by < 1 lane across the width).
  So the upsampled row splits into an EVEN and an ODD phase, each a
  per-lane lerp of the input row with itself rolled by one lane —
  two vector FMAs with precomputed (1, W/2) weight vectors. No gather,
  no dense interpolation matmul (a dense (W/2, W)@ matrix would triple
  the kernel's FLOPs).

* **The conv3 becomes 6 big MXU matmuls per row block.** In phase space,
  conv3's three horizontal taps at even output columns hit {O[j-1],
  E[j], O[j]} and at odd columns {E[j], O[j], E[j+1]} — all four needed
  streams (E, O, O rolled +1, E rolled -1) are staged once per block
  into a (256, (TY+2)*W/2) buffer whose sublane blocks are the streams.
  Each vertical tap dy then contributes ONE (64, 256) @ (256, TY*W/2)
  matmul per phase (the (c_out, {stream x c_in}) weights are just the
  conv kernel re-blocked), with the dy shift expressed as a static lane
  offset into the staged buffer. 18 tiny matmuls collapse to 6
  reduction-dim-256 ones.

* **Stores are layout-natural.** The kernel emits maps as
  (N, H, K, [even W/2 | odd W/2]): c_out lands in the sublane dim at
  store time (exactly what the MXU produces), sidestepping the
  c-in-sublanes vs K-leading relayout that sank the round-4 planar
  head-conv kernel (PERFORMANCE.md round-4). De-phasing + transposing
  to the sepconv-native (N, K, H, W) is one fused XLA copy
  (``dephase_transpose``).

Oracle/tests: ``head_tail_oracle`` reproduces the serving XLA path
(ops/resize.upsample2x_planar_mxu + lax.conv) in f32;
tests/test_head_tail.py checks the kernel in interpret mode, and
tools/tpu_checks.py gates it on hardware.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sstem_tpu.ops.resize import _taps

_LANES = 128
_CIN = 64          # staged input channels (real c_in padded with zeros)
_STREAMS = 4       # E, O, O<<1, E>>1
_TY = 8            # full-res output rows per grid step
_WIN = 16          # DMA'd half-res input rows per block (8-aligned)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=32)
def _phase_weights(wi: int):
    """Per-lane lerp weights of the two W phases (numpy, f32).

    even out column 2j   = we_prev[j] * in[j-1] + we_ctr[j] * in[j]
    odd  out column 2j+1 = wo_ctr[j]  * in[j]   + wo_next[j] * in[j+1]

    we_prev[0] == 0 and wo_next[wi-1] == 0 by construction, which also
    zero-kills the cyclic wrap lanes of the in-kernel rolls.
    """
    lo, hi, frac = _taps(wi, 2 * wi)
    we_prev = np.zeros(wi, np.float32)
    we_ctr = np.zeros(wi, np.float32)
    wo_ctr = np.zeros(wi, np.float32)
    wo_next = np.zeros(wi, np.float32)
    for j in range(wi):
        for src, wgt in ((int(lo[2 * j]), 1.0 - float(frac[2 * j])),
                         (int(hi[2 * j]), float(frac[2 * j]))):
            if src == j - 1:
                we_prev[j] += wgt
            elif src == j:
                we_ctr[j] += wgt
            else:
                assert wgt == 0.0, (j, src, wgt)
        for src, wgt in ((int(lo[2 * j + 1]), 1.0 - float(frac[2 * j + 1])),
                         (int(hi[2 * j + 1]), float(frac[2 * j + 1]))):
            if src == j:
                wo_ctr[j] += wgt
            elif src == j + 1:
                wo_next[j] += wgt
            else:
                assert wgt == 0.0, (j, src, wgt)
    return we_prev, we_ctr, wo_ctr, wo_next


def _h_taps(hi_rows: int, ty: int):
    """Per-staged-row H-lerp taps with a zero-weighted halo row each side
    (conv3's zero padding), plus the 8-aligned DMA window start per block.

    Returns (lo, wa, wb) of length 2*hi_rows + 2 (staged index s covers
    output row Y' = s - 1 in [-1, 2*hi_rows]) and win_r0 of length
    n_blocks; lo is pre-clamped into [0, hi_rows - 2] so lo+1 is always a
    valid window row even for the zero-weighted halo entries.
    """
    ho = 2 * hi_rows
    lo_t, hi_t, frac = _taps(hi_rows, ho)
    lo = np.zeros(ho + 2, np.int32)
    wa = np.zeros(ho + 2, np.float32)
    wb = np.zeros(ho + 2, np.float32)
    for s in range(ho + 2):
        y = s - 1
        oob = y < 0 or y >= ho
        # zero-weighted halo rows still contribute to the per-block window
        # span computation: clamp them onto the nearest REAL row's base so
        # the last block's window isn't dragged back to row 0.
        yc = min(max(y, 0), ho - 1)
        base = min(int(lo_t[yc]), hi_rows - 2)
        if oob:
            lo[s] = base
            continue
        for row, wgt in ((int(lo_t[y]), 1.0 - float(frac[y])),
                         (int(hi_t[y]), float(frac[y]))):
            if row == base:
                wa[s] += wgt
            elif row == base + 1:
                wb[s] += wgt
            else:
                raise AssertionError((y, row, base))
        lo[s] = base
    n_blocks = ho // _TY
    win_r0 = np.zeros(n_blocks, np.int32)
    for t in range(n_blocks):
        s0, s1 = t * _TY, t * _TY + _TY + 1
        first = int(lo[s0:s1 + 1].min())
        win_r0[t] = (first // 8) * 8
        assert int(lo[s0:s1 + 1].max()) + 1 < win_r0[t] + _WIN
    return lo, wa, wb, win_r0


def _build_lhs(w3):
    """(3, 3, cin<=64, k<=64) HWIO conv kernel -> (6, 64, 256) stream-blocked
    LHS: rows c_out, columns = 4 stream blocks x 64 c_in; [dy] for the even
    phase, [3 + dy] for the odd phase. jnp ops only — w3 is a tracer when
    the serving forward is jitted."""
    w = w3.astype(jnp.float32)

    def blk(dy, dx):
        m = jnp.transpose(w[dy, dx])  # (k, cin)
        return jnp.pad(m, [(0, 64 - m.shape[0]), (0, 64 - m.shape[1])])

    z = jnp.zeros((64, 64), jnp.float32)
    rows = []
    for dy in range(3):
        # even: dx=0 reads E, dx=+1 reads O, dx=-1 reads O<<1
        rows.append(jnp.concatenate([blk(dy, 1), blk(dy, 2), blk(dy, 0), z],
                                    axis=1))
    for dy in range(3):
        # odd: dx=-1 reads E, dx=0 reads O, dx=+1 reads E>>1
        rows.append(jnp.concatenate([blk(dy, 0), blk(dy, 1), z, blk(dy, 2)],
                                    axis=1))
    return jnp.stack(rows)


def _kernel(k, wi, x_hbm, a_ref, b_ref, wv_ref, lo_ref, wa_ref, wb_ref,
            wr0_ref, out_ref, win, stage, sem):
    n = pl.program_id(0)
    t = pl.program_id(1)
    r0 = wr0_ref[t]
    dma = pltpu.make_async_copy(x_hbm.at[n, pl.ds(r0, _WIN)], win, sem)
    dma.start()
    dma.wait()

    for s in range(_TY + 2):
        gi = t * _TY + s
        rel = lo_ref[gi] - r0
        u = (wa_ref[gi] * win[rel].astype(jnp.float32)
             + wb_ref[gi] * win[rel + 1].astype(jnp.float32))
        e = wv_ref[0] * pltpu.roll(u, 1, 1) + wv_ref[1] * u
        o = wv_ref[2] * u + wv_ref[3] * pltpu.roll(u, wi - 1, 1)
        op = pltpu.roll(o, 1, 1) * wv_ref[4]
        em = pltpu.roll(e, wi - 1, 1) * wv_ref[5]
        seg = slice(s * wi, (s + 1) * wi)
        stage[0:64, seg] = e.astype(stage.dtype)
        stage[64:128, seg] = o.astype(stage.dtype)
        stage[128:192, seg] = op.astype(stage.dtype)
        stage[192:256, seg] = em.astype(stage.dtype)

    lw = _TY * wi
    ye = jnp.zeros((64, lw), jnp.float32)
    yo = jnp.zeros((64, lw), jnp.float32)
    for dy in range(3):
        rhs = stage[:, dy * wi:dy * wi + lw]
        ye = ye + jnp.dot(a_ref[dy], rhs,
                          preferred_element_type=jnp.float32)
        yo = yo + jnp.dot(a_ref[3 + dy], rhs,
                          preferred_element_type=jnp.float32)
    bias = b_ref[...]
    ye = (ye + bias).astype(out_ref.dtype)
    yo = (yo + bias).astype(out_ref.dtype)
    for r in range(_TY):
        out_ref[0, r] = jnp.concatenate(
            [ye[:k, r * wi:(r + 1) * wi], yo[:k, r * wi:(r + 1) * wi]],
            axis=1)


def head_tail_fused(x, w3, b3, interpret=False):
    """Fused 2x align-corners upsample + 3x3 conv, phase-planar output.

    Args:
      x: (N, Hi, 64, Wi) half-res head features, channels-in-sublanes;
         channels >= w3's c_in must be zero (the packed head convs emit
         zeros there). Wi must be a lane multiple, Hi a multiple of 4.
      w3: (3, 3, c_in, k) HWIO conv kernel (c_in, k <= 64).
      b3: (k,) bias.

    Returns:
      (N, 2*Hi, k, 2*Wi) bf16 maps, lane dim phase-planar:
      [..., :Wi] are even output columns, [..., Wi:] odd.
    """
    n, hi_rows, cin_pad, wi = x.shape
    assert cin_pad == _CIN and wi % _LANES == 0 and hi_rows % 4 == 0, x.shape
    kh, kw, cin, k = w3.shape
    assert (kh, kw) == (3, 3) and cin <= 64 and k <= 64, w3.shape
    ho = 2 * hi_rows

    lo, wa, wb, win_r0 = _h_taps(hi_rows, _TY)
    we_prev, we_ctr, wo_ctr, wo_next = _phase_weights(wi)
    mask0 = np.ones(wi, np.float32)
    mask0[0] = 0.0
    maskend = np.ones(wi, np.float32)
    maskend[-1] = 0.0
    wv = np.stack([we_prev, we_ctr, wo_ctr, wo_next, mask0, maskend])

    a = _build_lhs(w3).astype(jnp.bfloat16)
    bias = jnp.pad(b3.astype(jnp.float32), (0, 64 - k))[:, None]

    hpad = int(win_r0[-1]) + _WIN
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 [(0, 0), (0, hpad - hi_rows), (0, 0), (0, 0)])

    grid = (n, ho // _TY)
    out = pl.pallas_call(
        functools.partial(_kernel, k, wi),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, _TY, k, 2 * wi),
                               lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, ho, k, 2 * wi), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((_WIN, _CIN, wi), jnp.bfloat16),
            pltpu.VMEM((_STREAMS * 64, (_TY + 2) * wi), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (ho // _TY) * 6 * 64 * 256 * _TY * wi,
            bytes_accessed=2 * n * (hpad * _CIN * wi + ho * k * 2 * wi),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, a, bias, jnp.asarray(wv[:, None, :]),
      jnp.asarray(lo), jnp.asarray(wa), jnp.asarray(wb),
      jnp.asarray(win_r0))
    return out


def dephase_transpose(m, wi: int):
    """Phase-planar (N, H, K, [even|odd]) -> sepconv-native (N, K, H, W).
    One fused XLA copy (interleave + transpose)."""
    n, h, k, wpp = m.shape
    assert wpp == 2 * wi
    st = jnp.stack([m[..., :wi], m[..., wi:]], axis=-1).reshape(n, h, k,
                                                                2 * wi)
    return jnp.transpose(st, (0, 2, 1, 3))


def head_tail_oracle(x, w3, b3, precision=None):
    """XLA reference of the serving head tail on the kernel's input layout:
    (N, Hi, 64, Wi) -> standard planar maps (N, k, 2Hi, 2Wi). Mirrors
    models/serving.py head(): upsample2x_planar_mxu + NCHW conv."""
    from sstem_tpu.ops.resize import upsample2x_planar_mxu

    cin = w3.shape[2]
    pl_x = jnp.transpose(x[:, :, :cin, :], (0, 2, 1, 3))
    up = upsample2x_planar_mxu(pl_x, precision=precision)
    y = lax.conv_general_dilated(
        up, w3, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NCHW", "HWIO", "NCHW"), precision=precision)
    return y + b3[None, :, None, None]
