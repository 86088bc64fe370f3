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

# The banded warp itself lives in sstem_tpu/kernels/warp_band.py since r4
# (it landed in serving with a measured 2.5x win); this probe keeps the
# micro-probes that established the Mosaic envelope (which dynamic-gather
# shapes compile, dynamic-shift rolls) and drives the production kernel
# for parity/bench so the numbers stay reproducible from one entry point.
from sstem_tpu.kernels.warp_band import warp_band  # noqa: E402

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
        got = np.asarray(warp_band(
            im, flow, interpret=args.interpret)[0])
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
        f = jax.jit(lambda a, b, w=winb: warp_band(a, b, win=w)[0])
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
        f = jax.jit(lambda a, b, w=winb: warp_band(a, b, win=w)[0])
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
