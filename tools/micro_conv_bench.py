"""Micro-bench conv/deconv/BN pieces of the full-section nets (run on TPU).

Finds where FusionNet's / UNetSFF's per-section time goes:

    python tools/micro_conv_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    n = 4
    rng = np.random.default_rng(0)

    def bench(f, *fargs, name="", iters=6, warm=10):
        def sync(outs):
            return float(jnp.stack(
                [jnp.sum(o.astype(jnp.float32)) for o in outs]).sum())
        sync([f(*fargs)])
        sync([f(*fargs) for _ in range(warm)])
        t0 = time.time()
        sync([f(*fargs) for _ in range(iters)])
        ms = (time.time() - t0) / iters / n * 1e3
        print("%-42s %7.2f ms/section" % (name, ms), flush=True)
        return ms

    def conv(x, w, lhs_dil=1, pad=1):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad)] * 2,
            lhs_dilation=(lhs_dil, lhs_dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), jnp.float32).astype(dtype)

    # FusionNet level-1 conv: 32ch @ 1280^2
    x = mk((n, 1280, 1280, 32))
    w = mk((3, 3, 32, 32))
    bench(jax.jit(conv), x, w, name="conv3x3 32->32 @1280 bf16")

    # level-2: 64 @ 640
    bench(jax.jit(conv), mk((n, 640, 640, 64)), mk((3, 3, 64, 64)),
          name="conv3x3 64->64 @640 bf16")
    # level-3: 128 @ 320
    bench(jax.jit(conv), mk((n, 320, 320, 128)), mk((3, 3, 128, 128)),
          name="conv3x3 128->128 @320 bf16")
    # level-4: 256 @ 160
    bench(jax.jit(conv), mk((n, 160, 160, 256)), mk((3, 3, 256, 256)),
          name="conv3x3 256->256 @160 bf16")
    # bridge: 512 @ 80
    bench(jax.jit(conv), mk((n, 80, 80, 512)), mk((3, 3, 512, 512)),
          name="conv3x3 512->512 @80 bf16")

    # deconv via lhs_dilation: 64->32 @640->1280
    xd = mk((n, 640, 640, 64))
    wd = mk((3, 3, 64, 32))
    bench(jax.jit(lambda a, b: conv(a, b, lhs_dil=2, pad=1)), xd, wd,
          name="deconv(dilated) 64->32 @640->1280")

    # deconv as 4-phase conv + depth_to_space (same FLOPs as 2x2 conv)
    def deconv_d2s(x, w4):
        y = conv(x, w4, pad=1)  # (n, h, w, 4*cout) with 3x3 (padded) taps
        nn_, h, wdt, c4 = y.shape
        c = c4 // 4
        y = y.reshape(nn_, h, wdt, 2, 2, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(nn_, h * 2, wdt * 2, c)
        return y

    w4 = mk((3, 3, 64, 128))
    bench(jax.jit(deconv_d2s), xd, w4,
          name="deconv(d2s 3x3-4phase) 64->32 @640->1280")

    # IFNet head conv3: 51->51 @1280
    bench(jax.jit(conv), mk((n, 1280, 1280, 51)), mk((3, 3, 51, 51)),
          name="conv3x3 51->51 @1280 bf16 (head conv3)")
    # packed variant: NCHW planar 51->51
    def conv_nchw(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
    bench(jax.jit(conv_nchw), mk((n, 51, 1280, 1280)), mk((3, 3, 51, 51)),
          name="conv3x3 51->51 @1280 NCHW planar")
    # head conv3 layout variants (the 4-head hot spot):
    # (a) channel-pad to 64 NHWC — taps 51..63 are zero weights, exact math
    bench(jax.jit(conv), mk((n, 1280, 1280, 64)), mk((3, 3, 64, 64)),
          name="conv3x3 64->64 @1280 NHWC (padded)")
    # (b) all 4 heads fused as one grouped conv, C=204
    def gconv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=4)
    bench(jax.jit(gconv), mk((n, 1280, 1280, 204)), mk((3, 3, 51, 204)),
          name="conv3x3 grouped4 204->204 @1280 NHWC")
    # (c) grouped + padded, C=256
    bench(jax.jit(gconv), mk((n, 1280, 1280, 256)), mk((3, 3, 64, 256)),
          name="conv3x3 grouped4 256->256 @1280 NHWC")
    # (d) 4 heads as extra batch: planar NCHW, batch 4n
    bench(jax.jit(conv_nchw), mk((4 * n, 51, 1280, 1280)),
          mk((3, 3, 51, 51)),
          name="conv3x3 51->51 @1280 NCHW batchx4 (/4)", )
    # (e) padded planar NCHW 64
    bench(jax.jit(conv_nchw), mk((n, 64, 1280, 1280)), mk((3, 3, 64, 64)),
          name="conv3x3 64->64 @1280 NCHW planar (padded)")

    # first conv 6->32 @1280 (f32 in, bf16 math)
    bench(jax.jit(conv), mk((n, 1280, 1280, 6)), mk((3, 3, 6, 32)),
          name="conv3x3 6->32 @1280")

    # max pool + BN-ish elementwise at 1280
    x32 = mk((n, 1280, 1280, 32))
    bench(jax.jit(lambda t: lax.reduce_window(
        t, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")), x32,
        name="maxpool2x2 @1280x32")
    g = mk((32,), jnp.float32)
    b = mk((32,), jnp.float32)
    bench(jax.jit(lambda t, gg, bb: (t.astype(jnp.float32) * gg + bb)
                  .astype(jnp.bfloat16)), x32, g, b,
          name="BN-eval elementwise @1280x32 (unfused)")


if __name__ == "__main__":
    main()
