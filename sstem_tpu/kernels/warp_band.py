"""Banded Pallas warp: the serving backward-warp as row-window gathers.

The serving warp (`ops/warp.py::spatial_transform`, reference semantics
``image_warp_torch.py:97-113``) is a single corner-packed XLA gather that
cost ~16-22 ms/section at the bench shape — bounded by the TPU gather
path, not by traffic. This kernel exploits two structural facts of SFF
unfolding flows (`simu_sff/flow_synthesis.py:20-87`):

* displacements are bounded by the fold width (|flow| <= ~80 px << H),
  so each 8-row output block reads from a narrow source-row window; and
* the fold DISCONTINUITY splits a block's source rows into at most two
  narrow intervals (measured: worst per-block row span 121, but the two
  clusters are ~6 rows each), so visiting the two intervals instead of
  [min, max] bounds the row loop.

Design (per (batch, 8-row block) grid step):

1. Compute the index/weight fields (floor/clip/fractions/vreg ids) from
   the RAW flow block in VMEM — v1 materialized seven full-resolution
   fields on the XLA side, and that prep dominated the kernel 3:1
   (8.8 ms total vs ~2.5 in-kernel; PERFORMANCE.md round-4).
2. DMA the block's ``win`` source rows HBM->VMEM (dynamic 8-aligned row
   base from SMEM, the sepconv halo idiom — `sepconv.py::_fwd_kernel`).
3. Loop source rows r over the (at most two) SMEM row intervals. For
   each r: gather the row's columns at the block's x-coordinates and
   accumulate the bilinear mix masked by ``floor(y) == r``.
4. The column gather is composed from single-vreg lane gathers: this
   Mosaic stack only compiles ``tpu.dynamic_gather`` on one (8, 128)
   vreg (wider lane gathers and all sublane gathers fail — probe_gather
   micro-probes), so the row is sliced into static 128-lane vregs and
   each output vreg j combines gathers from source vregs j-KC..j+KC with
   ``x >> 7 == v`` masks. KC=1 covers |flow_x| < 127 after clamping.
   Gather sources must be ``pltpu.repeat``-materialized — a replicated-
   sublane broadcast feeding the gather crashes this Mosaic.

Exactness envelope (checked on the XLA side — two fused reductions over
the flow, no full-res field materialization): every block's source-row
span must fit ``win`` and every pixel's source column must lie within
KC vregs of its own. GT-scale fold flows satisfy both;
``warp_band_or_xla`` lax.cond-switches to the XLA warp otherwise, so
the composite is exact for ARBITRARY flows (tests cover far
out-of-range). Result matches spatial_transform to f32 rounding
(<= ~2e-7 on unit-range images; the bilinear mix associates
differently).

Parity: tests/test_warp_band.py (interpret mode); hardware entry in
tools/tpu_checks.py; serving integration via ``serving_warp``.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 8   # output rows per grid step (one f32 sublane tile)
KC = 1           # source-vreg reach either side (|flow_x| < 127)
DEFAULT_WIN = 160  # covers measured GT fold row spans (<= 129 after
                   # 8-alignment; PERFORMANCE.md probe_gather stats)


def _kernel(win, nlv, pw0, ph, w, nblk, nb, rbase_ref, iv_ref, imp_hbm,
            fx_ref, fy_ref, out_ref, scratch, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # double-buffered window stream (the conv3x3.py idiom): block
    # (b, i+1)'s rows are in flight while (b, i) computes — 640 small
    # sequential DMAs otherwise stack their full latency
    def dma_for(slot, bb, ii):
        rb = pl.multiple_of(rbase_ref[bb, ii], BLOCK_ROWS)
        return pltpu.make_async_copy(
            imp_hbm.at[bb, pl.ds(rb, win), :], scratch.at[slot],
            sem.at[slot])

    flat = b * nblk + i
    par = lax.rem(flat, 2)

    @pl.when(flat == 0)
    def _first():
        dma_for(0, 0, 0).start()

    @pl.when(flat + 1 < nb * nblk)
    def _prefetch():
        nx_b = jnp.where(i + 1 < nblk, b, b + 1)
        nx_i = jnp.where(i + 1 < nblk, i + 1, 0)
        dma_for(lax.rem(flat + 1, 2), nx_b, nx_i).start()

    dma = dma_for(par, b, i)
    rb = pl.multiple_of(rbase_ref[b, i], BLOCK_ROWS)

    # ---- index/weight fields from the raw flow block (VPU, once) ----
    pw = nlv * 128
    lane = lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, pw), 1)
    gxf = lane.astype(jnp.float32)
    gyf = (lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, pw), 0)
           + i * BLOCK_ROWS).astype(jnp.float32)
    x = fx_ref[0] + gxf + 1.0
    y = fy_ref[0] + gyf + 1.0
    x0u = jnp.floor(x).astype(jnp.int32)
    y0u = jnp.floor(y).astype(jnp.int32)
    # reference clamp order (image_warp_torch.py:100-105): the +1 corner
    # clips the UNclipped base
    x1cv = jnp.clip(x0u + 1, 0, pw0 - 1)
    y1cv = jnp.clip(y0u + 1, 0, ph - 1)
    x0cv = jnp.clip(x0u, 0, pw0 - 1)
    y0cv = jnp.clip(y0u, 0, ph - 1)
    wxv = x1cv.astype(jnp.float32) - x
    # y1c == y0c (row clamp collapse): the dy*ia + (1-dy)*ib mix
    # collapses to one visit of that row — fold the whole weight into wy
    wyv = jnp.where(y1cv == y0cv, 1.0,
                    y1cv.astype(jnp.float32) - y)
    invalid = lane >= w  # zero-padded flow lanes must never contribute
    y0rv = jnp.where(invalid, -3, y0cv - rb)
    q0v = jnp.where(invalid, -9, x0cv >> 7)
    q1v = jnp.where(invalid, -9, x1cv >> 7)
    loc0v = x0cv & 127
    loc1v = x1cv & 127

    sl = lambda a, j: lax.slice_in_dim(a, 128 * j, 128 * (j + 1), axis=1)
    loc0 = [sl(loc0v, j) for j in range(nlv)]
    q0 = [sl(q0v, j) for j in range(nlv)]
    loc1 = [sl(loc1v, j) for j in range(nlv)]
    q1 = [sl(q1v, j) for j in range(nlv)]
    wx = [sl(wxv, j) for j in range(nlv)]
    wy = [sl(wyv, j) for j in range(nlv)]
    y0r = [sl(y0rv, j) for j in range(nlv)]

    dma.wait()
    cur = scratch.at[par]

    def body(r, acc):
        row8 = pltpu.repeat(cur[pl.ds(r, 1), :], BLOCK_ROWS, axis=0)
        pieces = []
        for j in range(nlv):
            g0 = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
            g1 = jnp.zeros((BLOCK_ROWS, 128), jnp.float32)
            for v in range(max(0, j - KC), min(nlv, j + KC + 1)):
                src = lax.slice_in_dim(row8, 128 * v, 128 * (v + 1),
                                       axis=1)
                gv0 = jnp.take_along_axis(src, loc0[j], axis=1)
                gv1 = jnp.take_along_axis(src, loc1[j], axis=1)
                g0 = g0 + jnp.where(q0[j] == v, gv0, 0.0)
                g1 = g1 + jnp.where(q1[j] == v, gv1, 0.0)
            colmix = wx[j] * g0 + (1.0 - wx[j]) * g1
            m0 = (y0r[j] == r).astype(jnp.float32)
            m1 = (y0r[j] == r - 1).astype(jnp.float32)
            pieces.append(colmix * (m0 * wy[j] + m1 * (1.0 - wy[j])))
        return acc + jnp.concatenate(pieces, axis=1)

    acc = jnp.zeros((BLOCK_ROWS, nlv * 128), jnp.float32)
    a0 = iv_ref[b, i, 0]
    acc = lax.fori_loop(a0, a0 + iv_ref[b, i, 1], body, acc)
    b0 = iv_ref[b, i, 2]
    acc = lax.fori_loop(b0, b0 + iv_ref[b, i, 3], body, acc)
    out_ref[0] = acc


def _band_call(imp, fx, fy, rbase, intervals, pw0, ph, w, win,
               interpret=False):
    n, php, pw = imp.shape
    h = fx.shape[1]
    nblk = h // BLOCK_ROWS
    nlv = pw // 128

    blk = lambda b, i: (b, i, 0)  # noqa: E731
    vspec = pl.BlockSpec((1, BLOCK_ROWS, pw), blk,
                         memory_space=pltpu.VMEM)
    # whole-array SMEM specs: per-block (1, x) SMEM blocks trip the
    # Mosaic (8, 128) block-divisibility check (probe_gather r4 finding);
    # scalars are read at [program_id(0), program_id(1)] instead
    smem_all = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b, i: tuple(0 for _ in shape),
        memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_kernel, win, nlv, pw0, ph, w, nblk, n),
        grid=(n, nblk),
        in_specs=[smem_all((n, nblk)), smem_all((n, nblk, 4)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((n, h, pw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win, pw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * n * h * pw,
            bytes_accessed=4 * n * (nblk * win * pw // 4 + 3 * h * pw),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rbase, intervals, imp, fx, fy)


def _prep(im, flow, win):
    """XLA side: padded image, padded flow planes, per-block row windows
    + two-interval visit lists, and the exactness predicate. Everything
    full-resolution here is either the (small) padded image or a fused
    elementwise+reduction over the flow — no index/weight fields are
    materialized (they were 3x the kernel's own cost in v1)."""
    n, h, w, _ = im.shape
    ph, pw0 = h + 2, w + 2
    pw = -(-pw0 // 128) * 128
    php = max(-(-ph // BLOCK_ROWS) * BLOCK_ROWS, win)
    imp = jnp.pad(im[..., 0].astype(jnp.float32),
                  [(0, 0), (1, php - ph + 1), (1, pw - pw0 + 1)])

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = flow[..., 0] + gx + 1.0
    y = flow[..., 1] + gy + 1.0
    x0u = jnp.floor(x).astype(jnp.int32)
    y0u = jnp.floor(y).astype(jnp.int32)
    x1c = jnp.clip(x0u + 1, 0, pw0 - 1)
    y1c = jnp.clip(y0u + 1, 0, ph - 1)
    x0c = jnp.clip(x0u, 0, pw0 - 1)
    y0c = jnp.clip(y0u, 0, ph - 1)

    # per-(batch, block) 8-aligned source-row window
    y0cb = y0c.reshape(n, h // BLOCK_ROWS, BLOCK_ROWS, w)
    y1cb = y1c.reshape(n, h // BLOCK_ROWS, BLOCK_ROWS, w)
    rmin = jnp.min(y0cb, axis=(2, 3))
    rmax = jnp.max(jnp.maximum(y0cb, y1cb), axis=(2, 3))
    rbase = jnp.clip((rmin // 8) * 8, 0, php - win)
    rows_fit = jnp.all(rmax - rbase < win)

    # column-vreg envelope: every pixel's source vreg (padded-image
    # column space, which is also the scratch/vreg space the kernel
    # slices) within KC of the pixel's OUTPUT vreg
    jvreg = jnp.arange(w, dtype=jnp.int32)[None, None, :] // 128
    cols_fit = jnp.all((jnp.abs((x0c >> 7) - jvreg) <= KC)
                       & (jnp.abs((x1c >> 7) - jvreg) <= KC))

    # two-interval row visiting (fold discontinuity): cluster each
    # block's window-relative rows around the midpoint, visit [minA,
    # maxA+1] and [minB, maxB+1] (merged when touching)
    d = (y0cb - rbase[..., None, None]).astype(jnp.int32)
    dmin = rmin - rbase
    dmax = rmax - rbase
    dmid = (dmin + dmax) // 2
    big = jnp.int32(1 << 20)
    mA = d <= dmid[..., None, None]
    amin = jnp.min(jnp.where(mA, d, big), axis=(2, 3))
    amax = jnp.max(jnp.where(mA, d, -big), axis=(2, 3)) + 1
    bmin = jnp.min(jnp.where(mA, big, d), axis=(2, 3))
    bmax = jnp.max(jnp.where(mA, -big, d), axis=(2, 3)) + 1
    has_b = bmin < big
    touching = has_b & (bmin <= amax + 1)
    amax = jnp.where(touching, jnp.maximum(amax, bmax), amax)
    has_b = has_b & ~touching
    aoff = jnp.clip(amin, 0, win)
    acnt = jnp.clip(amax - aoff + 1, 0, win - aoff)
    boff = jnp.where(has_b, jnp.clip(bmin, 0, win), 0)
    bcnt = jnp.where(has_b, jnp.clip(bmax - boff + 1, 0, win - boff), 0)
    intervals = jnp.stack([aoff, acnt, boff, bcnt], axis=-1).astype(
        jnp.int32)

    pad_cols = [(0, 0), (0, 0), (0, pw - w)]
    fx = jnp.pad(flow[..., 0], pad_cols)
    fy = jnp.pad(flow[..., 1], pad_cols)
    exact = rows_fit & cols_fit
    return (imp, fx, fy, rbase.astype(jnp.int32), intervals, exact,
            pw0, ph)


def warp_band(im, flow, win=DEFAULT_WIN, interpret=False):
    """spatial_transform semantics via the banded Pallas gather.

    Args:
      im: (N, H, W, 1) array; H must be a multiple of 8.
      flow: (N, H, W, 2); channel 0 dx, channel 1 dy.
      win: static VMEM source-row window (rows per block DMA).

    Returns:
      (out, exact): (N, H, W, 1) float32 and a scalar bool that is True
      iff the kernel's row-window + column-vreg envelope held (the
      result matches spatial_transform to f32 rounding exactly then;
      callers wanting arbitrary flows use warp_band_or_xla).
    """
    n, h, w, c = im.shape
    assert c == 1, "banded warp is single-channel (serving layout)"
    assert h % BLOCK_ROWS == 0, "pad H to a multiple of 8 first"
    imp, fx, fy, rbase, intervals, exact, pw0, ph = _prep(im, flow, win)
    out = _band_call(imp, fx, fy, rbase, intervals, pw0, ph, w, win,
                     interpret=interpret)
    return out[:, :, :w, None], exact


def warp_band_or_xla(im, flow, win=DEFAULT_WIN, interpret=False):
    """Exact for arbitrary flows: banded kernel inside the envelope,
    XLA corner-packed gather (ops/warp.py) outside it. lax.cond keeps
    the expensive XLA gather off the hot path at runtime."""
    from sstem_tpu.ops.warp import spatial_transform

    n, h, w, c = im.shape
    imp, fx, fy, rbase, intervals, exact, pw0, ph = _prep(im, flow, win)

    def band(_):
        out = _band_call(imp, fx, fy, rbase, intervals, pw0, ph, w, win,
                         interpret=interpret)
        return out[:, :, :w, None]

    return lax.cond(exact, band,
                    lambda _: spatial_transform(im, flow), None)


def serving_warp(im, flow, win=DEFAULT_WIN):
    """The serving pipeline's warp: banded Pallas kernel (vs the XLA
    corner-packed gather at the bench shape — PERFORMANCE.md round-4)
    with the exactness-checked XLA fallback; plain spatial_transform
    off-TPU or at unsupported shapes. Safe for arbitrary flows either
    way."""
    from sstem_tpu.ops.warp import spatial_transform as _st

    n, h, w, c = im.shape
    if jax.default_backend() != "tpu" or h % BLOCK_ROWS or c != 1:
        return _st(im, flow)
    return warp_band_or_xla(im, flow, win=win)
