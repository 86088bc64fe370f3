"""Micro-benchmarks for round-2 perf work (run on TPU).

Times the Pallas sepconv internals (prep vs kernel), conv shapes that make
up the IFNet trunk/heads, and warp variants. Not part of the test suite.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    import sstem_tpu.config as cfg
    import importlib
    sc = importlib.import_module("sstem_tpu.kernels.sepconv")

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1280)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--which", default="all")
    args = parser.parse_args()

    cfg.set_matmul_precision("default")
    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    h = w = args.size
    rng = np.random.default_rng(0)

    def bench(f, *fargs, name=""):
        float(jnp.sum(f(*fargs)))
        float(jnp.sum(f(*fargs)))
        t0 = time.time()
        outs = [f(*fargs) for _ in range(args.iters)]
        float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        dt = (time.time() - t0) / args.iters * 1e3
        print("%-38s %8.2f ms" % (name, dt))
        return dt

    if args.which in ("all", "sepconv"):
        im = jnp.asarray(rng.standard_normal((1, h + 50, w + 50, 1)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, h, w, 51)), jnp.float32) / 51
        hk = jnp.asarray(rng.standard_normal((1, h, w, 51)), jnp.float32) / 51

        bench(jax.jit(lambda a, b, c: sc._sepconv_fwd_pallas(a, b, c)),
              im, v, hk, name="pallas fwd (full, incl prep)")

        # prep only
        ty = sc._pick_tile(h, w, 51)
        print("ty =", ty)
        bench(jax.jit(lambda a, b, c: sum(
            jnp.sum(t) for t in sc._prep_planar(a, b, c, ty, 51)[:3])),
            im, v, hk, name="prep_planar only")

        # kernel only on pre-planarized inputs
        im_p, v_p, h_p, ho, wo, hpad, wp_pad = sc._prep_planar(
            im, v, hk, ty, 51)
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel_only(im_p, v_p, h_p):
            n = 1
            c = 1
            k = 51
            grid = (n, hpad // ty)
            return pl.pallas_call(
                functools.partial(sc._fwd_kernel, k, ty, wo, c),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.HBM),
                    pl.BlockSpec((1, k, ty, wo), lambda i, t: (i, 0, t, 0)),
                    pl.BlockSpec((1, k, ty, wo), lambda i, t: (i, 0, t, 0)),
                ],
                out_specs=pl.BlockSpec((1, c, ty, wo), lambda i, t: (i, 0, t, 0)),
                out_shape=jax.ShapeDtypeStruct((n, c, hpad, wo), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((c, sc._halo_rows(ty, k), wp_pad), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            )(im_p, v_p, h_p)

        bench(jax.jit(kernel_only), im_p, v_p, h_p, name="pallas kernel only")

    if args.which in ("all", "conv"):
        for (cin, cout, res, note) in [
            (6, 32, h, "L0 conv0"),
            (32, 32, h, "L0 conv1/2"),
            (32, 64, h // 2, "L1"),
            (64, 64, h // 2, "L1/head conv"),
            (64, 51, h // 2, "head conv2"),
            (51, 51, h, "head conv3 FULL RES"),
            (204, 204, h, "head conv3 merged x4"),
            (256, 256, h // 2, "head conv1 merged x4"),
        ]:
            x = jnp.asarray(rng.standard_normal((1, res, res, cin)), jnp.float32)
            kweights = jnp.asarray(
                rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)

            def conv(x, kw):
                return lax.conv_general_dilated(
                    x, kw, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=lax.Precision.DEFAULT)

            gf = res * res * 9 * cin * cout * 2 / 1e9
            dt = bench(jax.jit(conv), x, kweights,
                       name=f"conv {cin}->{cout} @{res} ({note}) {gf:.0f}GF")

            xb = x.astype(jnp.bfloat16)
            kb = kweights.astype(jnp.bfloat16)
            bench(jax.jit(conv), xb, kb,
                  name=f"  bf16 conv {cin}->{cout} @{res}")

    if args.which in ("all", "layout"):
        # how to get tap maps into planar (N,K,H,W) layout cheaply
        x = jnp.asarray(rng.standard_normal((1, h, w, 51)), jnp.float32)
        kw = jnp.asarray(rng.standard_normal((3, 3, 51, 51)) * 0.05,
                         jnp.float32)

        def conv_nhwc(x, kw):
            return lax.conv_general_dilated(
                x, kw, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=lax.Precision.DEFAULT)

        def conv_nchw_out(x, kw):
            return lax.conv_general_dilated(
                x, kw, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NCHW"),
                precision=lax.Precision.DEFAULT)

        def conv_then_transpose(x, kw):
            return jnp.transpose(conv_nhwc(x, kw), (0, 3, 1, 2))

        # force materialization by returning the array itself
        bench(jax.jit(conv_nhwc), x, kw, name="conv51 NHWC out")
        bench(jax.jit(conv_nchw_out), x, kw, name="conv51 NCHW out")
        bench(jax.jit(conv_then_transpose), x, kw,
              name="conv51 NHWC + transpose")
        bench(jax.jit(lambda x: jnp.transpose(x, (0, 3, 1, 2)) * 1.0), x,
              name="bare transpose NHWC->NCHW")
        xb = x.astype(jnp.bfloat16)
        kb = kw.astype(jnp.bfloat16)
        bench(jax.jit(conv_nchw_out), xb, kb, name="bf16 conv51 NCHW out")
        bench(jax.jit(lambda x: jnp.transpose(x, (0, 3, 1, 2)) * 1.0), xb,
              name="bf16 bare transpose")

    if args.which in ("all", "warp"):
        from sstem_tpu.ops import spatial_transform
        x1 = jnp.asarray(rng.standard_normal((1, h, w, 1)), jnp.float32)
        flow = jnp.asarray(rng.standard_normal((1, h, w, 2)) * 3, jnp.float32)
        bench(jax.jit(spatial_transform), x1, flow, name="warp gather (1ch)")


if __name__ == "__main__":
    main()
