"""Packed Pallas conv3x3 vs XLA conv on the real TPU.

    python tools/bench_conv3x3.py
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

    from sstem_tpu.kernels.conv3x3 import (
        build_packed_weights, conv3x3_packed, fold_affine, pack_nhwc,
        unpack_nhwc)

    rng = np.random.default_rng(0)

    def timeit(f, *args, iters=8, warm=14):
        o = f(*args)
        jax.block_until_ready(o)
        for _ in range(warm):
            o = f(*args)
        jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(iters):
            o = f(*args)
        jax.block_until_ready(o)
        return (time.time() - t0) / iters

    for c, hw, n in [(32, 1280, 4), (64, 1280, 4), (64, 640, 4),
                     (128, 640, 4)]:
        p = 128 // c
        x = jnp.asarray(rng.standard_normal((n, hw, hw, c)),
                        jnp.float32).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) / (3 * np.sqrt(c)),
                        jnp.float32).astype(jnp.bfloat16)

        @jax.jit
        def packed_conv(x, w):
            xq = pack_nhwc(x)
            r = build_packed_weights(w, 128 // x.shape[-1])
            sc, sh = fold_affine(x.shape[-1])
            yq = conv3x3_packed(xq, r, sc, sh, act="relu",
                                wq=x.shape[2] // (128 // x.shape[-1]))
            return unpack_nhwc(yq, x.shape[-1], x.shape[2])

        wq_n = hw // p

        @jax.jit
        def packed_conv_only(xq, r, sc, sh):
            return conv3x3_packed(xq, r, sc, sh, act="relu", wq=wq_n)

        @jax.jit
        def xla_conv(x, w):
            y = lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y, 0)

        try:
            y = packed_conv(x, w)
            yx = xla_conv(x, w)
            err = float(jnp.max(jnp.abs(
                y.astype(jnp.float32) - yx.astype(jnp.float32))))
            # kernel-only timing (pre-packed input, like chained layers)
            xq = jax.block_until_ready(pack_nhwc(x))
            r = jax.block_until_ready(build_packed_weights(w, p))
            sc, sh = fold_affine(c)
            dt_k = timeit(packed_conv_only, xq, r, sc, sh)
            dt_e = timeit(packed_conv, x, w)
            dt_x = timeit(xla_conv, x, w)
            gb = 2 * 2 * n * hw * hw * c / 1e9
            print(f"C{c:3d} @{hw}: packed-kernel {dt_k*1e3/n:6.2f} "
                  f"ms/sec ({gb/dt_k:5.1f} GB/s)  e2e {dt_e*1e3/n:6.2f}  "
                  f"xla {dt_x*1e3/n:6.2f} ({gb/dt_x:5.1f} GB/s)  "
                  f"maxerr {err:.3e}", flush=True)
        except Exception as e:
            print(f"C{c} @{hw}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
