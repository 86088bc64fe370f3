"""Probe: Mosaic ``tpu.dynamic_gather`` as a warp-gather building block.

The serving warp (ops/warp.py::spatial_transform) costs ~16 ms/section at
the bench shape — a single corner-packed XLA gather, bounded by the TPU
gather path (~6 GB/s effective; PERFORMANCE.md). This jax version lowers
``jnp.take_along_axis(src, idx, axis=0|1)`` with ``idx.shape == src.shape``
inside a Pallas kernel to ``tpu.dynamic_gather`` (per-lane sublane gather /
per-sublane lane gather), which rounds r1-r3 never tried.

Two questions, answered on hardware by ``--bench``:
  * prim_*: does the primitive compile at useful shapes (tall sublane
    gathers; lane gathers wider than one 128-lane vreg) and how fast is it?
  * warp_band: an EXACT banded warp — grid over (batch, row blocks); each
    block DMAs only the row window its flow needs (dynamic 8-aligned
    offset from an SMEM scalar, the sepconv halo-window idiom), then loops
    source rows r in [0, rcnt_b) (dynamic fori bound): two lane gathers
    per r (x0/x1 columns) + masked bilinear accumulation. Rows touched per
    block = the block's floor(y)-range — tiny off-fold, ~fold_width on it.

Parity: exact vs ops/warp.py::spatial_transform (same clamp quirks, same
zero 1-px border) on fold-synthesis flows and uniform random flows incl.
far out-of-range coordinates — run ``--parity --cpu`` for interpret mode
on CPU; on TPU the same check runs compiled.

Measured flow statistics (30 SimuSFF folds at 1280^2, det-size crop):
max |flow2| ~ 68 px either axis; worst per-8-row-block floor(y) range 121
(the fold DISCONTINUITY pulls adjacent pixels from across the fold, so
on-fold blocks need a ~130-row window while off-fold blocks need ~2).
Consequences: serving bucket win=160 covers GT-scale flows (with an XLA
cond fallback on overflow), and if on-fold blocks dominate the row loop
(the --bench fold case measures this), the follow-up is used-row
compaction: loop a host-precomputed per-block list of PRESENT source rows
instead of the full [rmin, rmax] interval.
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_ROWS = 8  # output rows per grid step (one f32 sublane tile)


def _warp_band_call(imp, x0, x1, y0r, wx, wy, rbase, intervals, win,
                    interpret=False):
    """Pallas call: imp (N, PHP, PW) f32 zero-padded image in HBM;
    index/weight fields (N, H, PW); rbase (N, H//8) int32, 8-aligned,
    with [rbase, rbase+win) covering every source row the block touches;
    intervals (N, H//8, 4) int32 = (aoff, acnt, boff, bcnt): one or two
    DISJOINT window-relative row intervals to visit (the fold
    discontinuity splits a block's source rows into two narrow bands —
    visiting only those instead of [min, max] is the difference between
    ~6 and ~130 row iterations on fold-crossing blocks).
    Returns (N, H, PW) f32."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, php, pw = imp.shape
    h = x0.shape[1]
    nblk = h // BLOCK_ROWS

    def kernel(rbase_ref, iv_ref, imp_hbm, x0_ref, x1_ref, y0r_ref,
               wx_ref, wy_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        rb = pl.multiple_of(rbase_ref[0, 0], 8)
        dma = pltpu.make_async_copy(
            imp_hbm.at[b, pl.ds(rb, win), :], scratch, sem)
        dma.start()
        dma.wait()
        x0v = x0_ref[0]
        x1v = x1_ref[0]
        y0r = y0r_ref[0]
        wx = wx_ref[0]
        wy = wy_ref[0]

        def body(r, acc):
            rows = jnp.broadcast_to(scratch[pl.ds(r, 1), :], x0v.shape)
            g0 = jnp.take_along_axis(rows, x0v, axis=1)
            g1 = jnp.take_along_axis(rows, x1v, axis=1)
            colmix = wx * g0 + (1.0 - wx) * g1
            m0 = (y0r == r).astype(jnp.float32)
            m1 = (y0r == r - 1).astype(jnp.float32)
            return acc + colmix * (m0 * wy + m1 * (1.0 - wy))

        acc = jnp.zeros(x0v.shape, jnp.float32)
        a0 = iv_ref[0, 0]
        acc = lax.fori_loop(a0, a0 + iv_ref[0, 1], body, acc)
        b0 = iv_ref[0, 2]
        acc = lax.fori_loop(b0, b0 + iv_ref[0, 3], body, acc)
        out_ref[0] = acc

    blk = lambda b, i: (b, i, 0)  # noqa: E731
    vspec = pl.BlockSpec((1, BLOCK_ROWS, pw), blk, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda b, i: (b, i),
                         memory_space=pltpu.SMEM)
    ivspec = pl.BlockSpec((1, 4), lambda b, i: (b, i),
                          memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(n, nblk),
        in_specs=[sspec, ivspec, pl.BlockSpec(memory_space=pltpu.HBM),
                  vspec, vspec, vspec, vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((n, h, pw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win, pw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * n * h * pw,
            bytes_accessed=4 * n * (php * pw + 7 * h * pw),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rbase, intervals.reshape(n, nblk * 4), imp, x0, x1, y0r, wx, wy)


def warp_band(im, flow, win=None, interpret=False):
    """spatial_transform semantics via the banded Pallas gather.

    im (N, H, W, 1) f32; flow (N, H, W, 2). ``win`` is the static VMEM row
    window; None = full padded height (always exact; serving would bucket).
    Exactness requires the per-block row range to fit in ``win`` after
    8-alignment — guaranteed for win=None, asserted via clamp otherwise.
    """
    import jax.numpy as jnp

    n, h, w, _ = im.shape
    assert h % BLOCK_ROWS == 0, "pad H to a multiple of 8 first"
    ph, pw0 = h + 2, w + 2
    pw = -(-pw0 // 128) * 128
    php = -(-ph // 8) * 8
    imp = jnp.pad(im[..., 0].astype(jnp.float32),
                  [(0, 0), (1, php - ph + 1), (1, pw - pw0 + 1)])

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = flow[..., 0] + gx + 1.0
    y = flow[..., 1] + gy + 1.0
    x0u = jnp.floor(x).astype(jnp.int32)
    y0u = jnp.floor(y).astype(jnp.int32)
    # reference clamp order (image_warp_torch.py:100-105): the +1 corner
    # clips the UNclipped base. Gathering directly at the four clamped
    # corners reproduces ops/warp.py's packed-table + substitution exactly.
    x1c = jnp.clip(x0u + 1, 0, pw0 - 1)
    y1c = jnp.clip(y0u + 1, 0, ph - 1)
    x0c = jnp.clip(x0u, 0, pw0 - 1)
    y0c = jnp.clip(y0u, 0, ph - 1)
    wx = x1c.astype(jnp.float32) - x
    wy = y1c.astype(jnp.float32) - y
    # When both row corners clamp to the same row (y1c == y0c), the
    # reference's dy*ia + (1-dy)*ib collapses to that row with weight 1;
    # the banded accumulation visits the row once (mask y0r == r), so fold
    # the full weight into wy there. Columns need no fix-up: x1c == x0c
    # makes g0 == g1 and the wx mix is already exact.
    wy = jnp.where(y1c == y0c, 1.0, wy)

    # per-(batch, block) row window over y0c and y1c, 8-aligned base
    y0cb = y0c.reshape(n, h // BLOCK_ROWS, BLOCK_ROWS, w)
    y1cb = y1c.reshape(n, h // BLOCK_ROWS, BLOCK_ROWS, w)
    rmin = jnp.min(y0cb, axis=(2, 3))
    rmax = jnp.max(jnp.maximum(y0cb, y1cb), axis=(2, 3))
    if win is None:
        win = php
    win = min(win, php)
    rbase = jnp.clip((rmin // 8) * 8, 0, php - win)

    # two-interval split (fold discontinuity): cluster each block's
    # window-relative source rows around the midpoint, then visit only
    # [minA, maxA+1] and [minB, maxB+1] (disjoint; merged when touching).
    d = (y0cb - rbase[..., None, None]).astype(jnp.int32)
    dmin = rmin - rbase
    dmax = rmax - rbase  # includes the +1 rows via y1cb above
    dmid = (dmin + dmax) // 2
    big = jnp.int32(1 << 20)
    mA = d <= dmid[..., None, None]
    amin = jnp.min(jnp.where(mA, d, big), axis=(2, 3))
    amax = jnp.max(jnp.where(mA, d, -big), axis=(2, 3)) + 1
    bmin = jnp.min(jnp.where(mA, big, d), axis=(2, 3))
    bmax = jnp.max(jnp.where(mA, -big, d), axis=(2, 3)) + 1
    has_b = bmin < big
    # merge when B touches A (or no B pixels)
    merged = jnp.where(has_b & (bmin <= amax + 1), bmax, amax)
    amax = jnp.where(has_b & (bmin <= amax + 1), jnp.maximum(amax, merged),
                     amax)
    has_b = has_b & (bmin > amax + 1)
    aoff = jnp.clip(amin, 0, win)
    acnt = jnp.clip(amax - aoff + 1, 0, win - aoff)
    boff = jnp.where(has_b, jnp.clip(bmin, 0, win), 0)
    bcnt = jnp.where(has_b, jnp.clip(bmax - boff + 1, 0, win - boff), 0)
    intervals = jnp.stack([aoff, acnt, boff, bcnt], axis=-1).astype(
        jnp.int32)

    pad_cols = [(0, 0), (0, 0), (0, pw - pw0)]
    x0cp = jnp.pad(x0c, pad_cols)
    x1cp = jnp.pad(x1c, pad_cols)
    y0rp = jnp.pad(y0c - jnp.repeat(rbase, BLOCK_ROWS, axis=1)[..., None],
                   pad_cols, constant_values=-3)
    wxp = jnp.pad(wx, pad_cols)
    wyp = jnp.pad(wy, pad_cols)

    out = _warp_band_call(imp, x0cp, x1cp, y0rp, wxp, wyp,
                          rbase.astype(jnp.int32), intervals, int(win),
                          interpret=interpret)
    return out[:, :, :w, None]


def parity(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from sstem_tpu.ops import spatial_transform
    from sstem_tpu.data.sim_sff import degrade_sff

    rng = np.random.default_rng(0)
    h = w = args.size
    n = 2
    im = jnp.asarray(rng.random((n, h, w, 1)), jnp.float32)

    cases = {}
    flows = []
    for _ in range(n):
        out = degrade_sff(np.asarray(
            rng.integers(0, 255, (h + 144, w + 144)), np.uint8),
            rng, det_size=h)
        flows.append(np.asarray(out["flow2"], np.float32)[:h, :w])
    cases["fold_flow2"] = jnp.asarray(np.stack(flows))
    cases["uniform_pm3"] = jnp.asarray(
        rng.uniform(-3, 3, (n, h, w, 2)), jnp.float32)
    cases["uniform_pm40"] = jnp.asarray(
        rng.uniform(-40, 40, (n, h, w, 2)), jnp.float32)
    cases["far_oob"] = jnp.asarray(
        rng.uniform(-2 * h, 2 * h, (n, h, w, 2)), jnp.float32)
    cases["integer_flow"] = jnp.asarray(
        rng.integers(-5, 6, (n, h, w, 2)).astype(np.float32))

    ok = True
    for name, flow in cases.items():
        want = np.asarray(spatial_transform(im, flow))
        got = np.asarray(warp_band(im, flow, interpret=args.interpret))
        err = float(np.max(np.abs(got - want)))
        status = "OK " if err == 0.0 else ("ok~" if err < 1e-6 else "FAIL")
        ok &= err < 1e-6
        print(f"{status} {name:14s} max_abs_err={err:.3e}", flush=True)
    return 0 if ok else 1


def bench(args):
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")
    from sstem_tpu.ops import spatial_transform

    n, h, w = args.batch, args.size, args.size
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((n, h, w, 1)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((n, h, w, 2)), jnp.float32) * 3

    def tbench(f, *fargs, name=""):
        def sync(o):
            return float(jnp.sum(o.astype(jnp.float32)))
        try:
            t0 = time.time()
            sync(f(*fargs))
            print(f"{name:36s} compile+first {time.time() - t0:6.1f}s",
                  flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)
            return None
        for _ in range(10):
            sync(f(*fargs))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.iters):
                sync(f(*fargs))
            best = min(best, (time.time() - t0) / args.iters / n * 1e3)
        print(f"{name:36s} {best:7.2f} ms/section", flush=True)
        return best

    def prim(axis, rows, cols):
        def k(src_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:],
                                             axis=axis)

        src = jnp.asarray(rng.random((rows, cols)), jnp.float32)
        lim = rows if axis == 0 else cols
        idx = jnp.asarray(rng.integers(0, lim, (rows, cols)), jnp.int32)
        f = jax.jit(lambda s, i: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, i))
        return f, src, idx

    for axis, rows, cols in [(0, 256, 128), (0, 1288, 128), (0, 256, 1280),
                             (1, 8, 128), (1, 8, 256), (1, 8, 384),
                             (1, 8, 1280), (1, 256, 1280)]:
        f, src, idx = prim(axis, rows, cols)
        tbench(f, src, idx, name=f"prim_gather axis={axis} {rows}x{cols}")

    # dynamic-shift lane roll (the gather-free fallback's inner op)
    def prim_roll(rows, cols):
        def k(src_ref, s_ref, out_ref):
            out_ref[:] = pltpu.roll(src_ref[:], s_ref[0, 0], axis=1)

        src = jnp.asarray(rng.random((rows, cols)), jnp.float32)
        s = jnp.asarray([[17]], jnp.int32)
        f = jax.jit(lambda a, b: pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b))
        return f, src, s

    for rows, cols in [(8, 128), (8, 1280)]:
        f, src, s = prim_roll(rows, cols)
        tbench(f, src, s, name=f"prim_roll_dynshift {rows}x{cols}")

    tbench(jax.jit(spatial_transform), im, flow,
           name="spatial_transform (XLA)")
    for winb in (args.win or [32, 160]):
        f = jax.jit(functools.partial(warp_band, win=winb))
        tbench(f, im, flow, name=f"warp_band win={winb}")
    # realistic fold flow at full scale (exercises the on-fold row ranges)
    from sstem_tpu.data.sim_sff import degrade_sff
    fold = []
    for _ in range(n):
        out = degrade_sff(np.asarray(
            rng.integers(0, 255, (h + 144, w + 144)), np.uint8),
            rng, det_size=h)
        fold.append(np.asarray(out["flow2"], np.float32)[:h, :w])
    foldf = jnp.asarray(np.stack(fold))
    for winb in (args.win or [160]):
        f = jax.jit(functools.partial(warp_band, win=winb))
        tbench(f, im, foldf, name=f"warp_band fold win={winb}")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--interpret", action="store_true", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--win", type=int, nargs="*", default=None)
    args = ap.parse_args()
    if args.interpret is None:
        args.interpret = args.cpu
    if args.parity:
        return parity(args)
    if args.bench:
        args.size = 1280 if args.size == 256 else args.size
        return bench(args)
    print("pass --parity or --bench")
    return 2


if __name__ == "__main__":
    sys.exit(main())
