"""Per-piece profile of the PRODUCTION serving path at the bench config.

Times the actual pieces bench.py composes (models/serving.py +
kernels/sepconv.py + ops/warp.py) so round-3 optimization targets measured
cost: the ifnet_serve trunk/head/sepconv split, the head tail
(upsample+conv3), FusionNet/UNetSFF serve, and the warp.

    python tools/profile_serve.py [--size 1280] [--batch 4] [--iters 6]
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

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1280)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--iters", type=int, default=6)
    args = parser.parse_args()

    cfg.set_matmul_precision("default")
    cfg.set_compute_dtype("bfloat16")
    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    from sstem_tpu.kernels import sepconv_planar
    from sstem_tpu.models import FusionNet, IFNet, UNetSFF
    from sstem_tpu.models.serving import (
        fusionnet_serve, ifnet_serve, unet_sff_serve)
    from sstem_tpu.ops import spatial_transform, upsample2x_planar_mxu

    n, h, w = args.batch, args.size, args.size
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x6 = jnp.asarray(rng.random((n, h, w, 6)), jnp.float32)
    init_in = jnp.zeros((1, 256, 256, 6), jnp.float32)

    def bench(f, *fargs, name=""):
        def sync(outs):
            return float(jnp.stack(
                [jnp.sum(o.astype(jnp.float32)) for o in outs]).sum())
        sync([f(*fargs)])
        sync([f(*fargs) for _ in range(10)])  # post-compile slow path
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            sync([f(*fargs) for _ in range(args.iters)])
            best = min(best, (time.time() - t0) / args.iters / n * 1e3)
        print("%-30s %7.2f ms/section" % (name, best), flush=True)
        return best

    variables = jax.jit(IFNet(51, 1).init)(key, init_in)

    bench(jax.jit(lambda v, x: ifnet_serve(v, x)), variables, x6,
          name="ifnet_serve (full)")

    # trunk of ifnet_serve: packed convs through featq (no heads/sepconv)
    from sstem_tpu.kernels.conv3x3 import pack_nhwc, unpack_nhwc
    from sstem_tpu.models import serving as sv

    def trunk_only(v, x):
        p = v["params"]
        wq1, wq2x = w // 4, (w // 2) // 2
        from sstem_tpu.kernels.pool import pool2x_packed

        xq = pack_nhwc(x.astype(jnp.bfloat16), pad_c=32 - x.shape[-1])
        x32q = sv._conv_module_packed(xq, p["conv32"], 32, wq1)
        p1q = pool2x_packed(x32q, 32, "avg", wq=wq1)
        x64q = sv._conv_module_packed(p1q, p["conv64"], 64, wq2x)
        x64 = unpack_nhwc(x64q, 64, w // 2)

        def avg_pool(t):
            return (lax.reduce_window(
                t.astype(jnp.float32), 0.0, lax.add, (1, 2, 2, 1),
                (1, 2, 2, 1), "VALID") * 0.25).astype(jnp.bfloat16)

        x128 = sv._conv_module_xla(avg_pool(x64), p["conv128"])
        x256 = sv._conv_module_xla(avg_pool(x128), p["conv256"])
        x512 = sv._conv_module_xla(avg_pool(x256), p["conv512"])
        xb = sv._conv_module_xla(avg_pool(x512), p["conv512x512"])
        xb = sv._upsample_module_xla(xb, p["upsamp512"],
                                     out_hw=x512.shape[1:3]) + x512
        xb = sv._conv_module_xla(xb, p["upconv256"])
        xb = sv._upsample_module_xla(xb, p["upsamp256"],
                                     out_hw=x256.shape[1:3]) + x256
        xb = sv._conv_module_xla(xb, p["upconv128"])
        xb = sv._upsample_module_xla(xb, p["upsamp128"],
                                     out_hw=x128.shape[1:3]) + x128
        xb = sv._conv_module_xla(xb, p["upconv64"])
        from sstem_tpu.ops import upsample_bilinear_align_corners
        up = upsample_bilinear_align_corners(
            xb, 2, out_hw=x64.shape[1:3]).astype(jnp.bfloat16)
        r, sc, sh = sv._packed_conv_args(
            p["upsamp64"]["conv"]["Conv_0"], None, None, 64)
        from sstem_tpu.kernels.conv3x3 import conv3x3_packed
        upq = conv3x3_packed(pack_nhwc(up), r, sc, sh, "relu", wq=wq2x)
        return upq + x64q

    bench(jax.jit(trunk_only), variables, x6, name="  trunk (to featq)")

    featq = jax.jit(trunk_only)(variables, x6)

    # one head: packed conv0-2 + planar upsample + planar conv3
    def one_head(v, fq):
        p = v["params"]["head2h"]
        wq2x = (w // 2) // 2
        hq = fq
        for name in ("conv0", "conv1", "conv2"):
            rr, ss, hh = sv._packed_conv_args(p[name]["Conv_0"], None,
                                              None, 64)
            from sstem_tpu.kernels.conv3x3 import conv3x3_packed
            hq = conv3x3_packed(hq, rr, ss, hh, "relu", wq=wq2x)
        hmap = unpack_nhwc(hq, 64, w // 2)[..., :51]
        hp_pl = jnp.transpose(hmap, (0, 3, 1, 2))
        hp_pl = upsample2x_planar_mxu(hp_pl,
                                      precision=cfg.matmul_precision())
        w3 = p["conv3"]["Conv_0"]["kernel"].astype(jnp.bfloat16)
        b3 = p["conv3"]["Conv_0"]["bias"].astype(jnp.bfloat16)
        y = lax.conv_general_dilated(
            hp_pl, w3, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            precision=cfg.matmul_precision())
        return y + b3[None, :, None, None]

    bench(jax.jit(one_head), variables, featq, name="  1 head (full tail)")

    # (the fused upsample+conv3 head-tail A/B lived here in r3-r4;
    # measured 2026-08-18: fused 16.43 vs planar 13.20 ms/section
    # per head, ifnet_serve 89.8 vs 63.7 — deleted per VERDICT r3
    # item 6, PERFORMANCE.md has the record)


    # head sub-pieces
    def head_convs(v, fq):
        p = v["params"]["head2h"]
        wq2x = (w // 2) // 2
        hq = fq
        for name in ("conv0", "conv1", "conv2"):
            rr, ss, hh = sv._packed_conv_args(p[name]["Conv_0"], None,
                                              None, 64)
            from sstem_tpu.kernels.conv3x3 import conv3x3_packed
            hq = conv3x3_packed(hq, rr, ss, hh, "relu", wq=wq2x)
        return hq

    bench(jax.jit(head_convs), variables, featq, name="    head conv0-2")

    hmap_half = jnp.asarray(
        rng.random((n, 51, h // 2, w // 2)), jnp.bfloat16)

    bench(jax.jit(lambda t: upsample2x_planar_mxu(
        t, precision=cfg.matmul_precision())), hmap_half,
        name="    planar upsample 2x")

    hmap_full = jnp.asarray(rng.random((n, 51, h, w)), jnp.bfloat16)
    w3 = jnp.asarray(rng.random((3, 3, 51, 51)), jnp.bfloat16)

    def conv3_planar(t):
        return lax.conv_general_dilated(
            t, w3, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            precision=cfg.matmul_precision())

    bench(jax.jit(conv3_planar), hmap_full, name="    planar conv3 51->51")

    imp = jnp.asarray(rng.random((n, 1, h + 50, w + 50)), jnp.bfloat16)
    vm = jnp.asarray(rng.random((n, 51, h, w)), jnp.bfloat16) / 51
    hm = jnp.asarray(rng.random((n, 51, h, w)), jnp.bfloat16) / 51
    bench(jax.jit(sepconv_planar), imp, vm, hm, name="  sepconv planar 1ch")

    fm = FusionNet(output_nc=2)
    vf = jax.jit(lambda k, x: fm.init(k, x, train=True))(key, init_in)
    um = UNetSFF(1)
    vu = jax.jit(lambda k, x: um.init(k, x, train=True))(key, init_in)
    x2 = x6[..., 0:2]

    bench(jax.jit(lambda v, x: fusionnet_serve(v, x)), vf, x2,
          name="fusionnet_serve (2ch)")
    bench(jax.jit(lambda v, x: unet_sff_serve(v, x)), vu, x2,
          name="unet_sff_serve (2ch)")

    flow = jnp.asarray(rng.standard_normal((n, h, w, 2)), jnp.float32) * 3
    bench(jax.jit(spatial_transform), x6[..., 0:1], flow,
          name="warp XLA (1ch)")
    from sstem_tpu.kernels.warp_band import serving_warp

    bench(jax.jit(serving_warp), x6[..., 0:1], flow,
          name="warp banded serving (1ch)")


if __name__ == "__main__":
    main()
