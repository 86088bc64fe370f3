"""Probe: can a Pallas MXU-dot conv beat XLA's ~33 GB/s conv rate?

Measures, on the real TPU:
  1. Pallas DMA round-trip bandwidth for NHWC blocks (channels-minor, the
     layout an MXU dot needs) at C in {51, 64, 128} vs planar blocks
     (row-contiguous) — small HBM bursts are the suspected ~33 GB/s cap.
  2. A "9-shifted-dot" conv3x3 tile kernel vs the XLA conv at the same
     shape. Column shifts are realized as THREE column-offset HBM DMAs per
     tile (no rolls, no sublane slices — alignment-safe at 3x read
     traffic); row taps are free leading-dim slices; the channel
     contraction is a bf16 MXU dot with f32 accumulation over the merged
     (ty*tx, C) matrix.

Run serially (shared pool):  python tools/probe_dma_conv.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")
    rng = np.random.default_rng(0)

    def timeit(f, *args, iters=8, warm=14):
        f(*args).block_until_ready()
        for _ in range(warm):
            o = f(*args)
        o.block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            o = f(*args)
        o.block_until_ready()
        return (time.time() - t0) / iters

    # ---------------- 1. DMA bandwidth: HBM -> VMEM -> HBM copy ------------
    def copy_kernel(src_hbm, out_ref, scratch, sem):
        t = pl.program_id(0)
        ty = scratch.shape[0]
        dma = pltpu.make_async_copy(
            src_hbm.at[pl.ds(t * ty, ty)], scratch, sem)
        dma.start()
        dma.wait()
        out_ref[...] = scratch[...]

    def dma_copy(x, ty):
        rows = x.shape[0]
        return pl.pallas_call(
            copy_kernel,
            grid=(rows // ty,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (ty,) + x.shape[1:], lambda t: (t,) + (0,) * (x.ndim - 1)),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[pltpu.VMEM((ty,) + x.shape[1:], x.dtype),
                            pltpu.SemaphoreType.DMA],
        )(x)

    print("== DMA round-trip bandwidth (read+write counted) ==", flush=True)
    for name, shape, ty in [
        ("NHWC C=51  (1280,1280,51)", (1280, 1280, 51), 4),
        ("NHWC C=64  (1280,1280,64)", (1280, 1280, 64), 4),
        ("NHWC C=128 (1280,1280,128)", (1280, 1280, 128), 4),
        ("planar     (64,1280,1280)", (64, 1280, 1280), 4),
    ]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32).astype(
            jnp.bfloat16)
        try:
            f = jax.jit(functools.partial(dma_copy, ty=ty))
            y = f(x)
            ok = bool(jnp.all(y == x))
            dt = timeit(f, x)
            gb = 2 * x.size * 2 / 1e9
            print(f"{name:30s} {dt*1e3:7.2f} ms  {gb/dt:6.1f} GB/s  "
                  f"correct={ok}", flush=True)
        except Exception as e:
            print(f"{name:30s} FAILED: {str(e)[:160]}", flush=True)

    # ---------------- 2. conv3x3 via 9 shifted bf16 dots -------------------
    def conv_kernel(ty, tx, x_hbm, w_ref, out_ref, b0, b1, b2, s0, s1, s2):
        t = pl.program_id(0)
        s = pl.program_id(1)
        bufs, sems = (b0, b1, b2), (s0, s1, s2)
        dmas = []
        for dx in range(3):
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(t * ty, ty + 2), pl.ds(s * tx + dx, tx)],
                bufs[dx], sems[dx])
            dma.start()
            dmas.append(dma)
        c = b0.shape[-1]
        co = out_ref.shape[-1]
        acc = jnp.zeros((ty * tx, co), jnp.float32)
        for dx in range(3):
            dmas[dx].wait()
            for dy in range(3):
                lhs = bufs[dx][dy:dy + ty].reshape(ty * tx, c)
                acc = acc + jax.lax.dot_general(
                    lhs, w_ref[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        out_ref[...] = acc.reshape(ty, tx, co).astype(out_ref.dtype)

    def pallas_conv(x, w, ty=8, tx=256):
        h, wdt, c = x.shape
        co = w.shape[-1]
        xp = jnp.pad(x, [(1, 1), (1, 1), (0, 0)])
        return pl.pallas_call(
            functools.partial(conv_kernel, ty, tx),
            grid=(h // ty, wdt // tx),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((3, 3, c, co), lambda t, s: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((ty, tx, co), lambda t, s: (t, s, 0)),
            out_shape=jax.ShapeDtypeStruct((h, wdt, co), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((ty + 2, tx, c), x.dtype),
                pltpu.VMEM((ty + 2, tx, c), x.dtype),
                pltpu.VMEM((ty + 2, tx, c), x.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )(xp, w)

    print("== conv3x3: Pallas 3-DMA 9-dot vs XLA ==", flush=True)
    for c, co, hw in [(64, 64, 1280), (32, 32, 1280), (128, 128, 640)]:
        x = jnp.asarray(
            rng.standard_normal((hw, hw, c)), jnp.float32).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.standard_normal((3, 3, c, co)) / (3 * c), jnp.float32
        ).astype(jnp.bfloat16)

        def xla_conv(x, w):
            return lax.conv_general_dilated(
                x[None], w, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

        try:
            fp = jax.jit(functools.partial(pallas_conv, tx=min(hw, 256)))
            yp = fp(x, w)
            yx = jax.jit(xla_conv)(x, w)
            err = float(jnp.max(jnp.abs(
                yp.astype(jnp.float32) - yx.astype(jnp.float32))))
            dt_p = timeit(fp, x, w)
            dt_x = timeit(jax.jit(xla_conv), x, w)
            gb = 2 * (x.size + hw * hw * co) / 1e9
            print(f"C{c}->{co} @{hw}: pallas {dt_p*1e3:6.2f} ms "
                  f"({gb/dt_p:5.1f} GB/s)  xla {dt_x*1e3:6.2f} ms "
                  f"({gb/dt_x:5.1f} GB/s)  maxerr {err:.3e}", flush=True)
        except Exception as e:
            print(f"C{c}->{co} @{hw}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
