"""Per-stage pipeline profiler (run on TPU).

Times each SFF pipeline stage at full-section resolution with pipelined
launches and a single sync (the host link adds ~30 ms per synchronized call
on tunneled rigs — see PERFORMANCE.md). Usage:

    python tools/profile_pipeline.py [--size 1280] [--iters 5]
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

    import sstem_tpu.config as cfg
    from sstem_tpu.kernels import sepconv
    from sstem_tpu.models import FusionNet, IFNet, UNetSFF
    from sstem_tpu.ops import spatial_transform

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1280)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--precision", default="default",
                        choices=["default", "high", "highest"])
    parser.add_argument("--compute-dtype", default=None,
                        choices=[None, "bfloat16"], nargs="?")
    args = parser.parse_args()

    cfg.set_matmul_precision(args.precision)
    if args.compute_dtype:
        cfg.set_compute_dtype(args.compute_dtype)
    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    h = w = args.size
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x6 = jnp.asarray(rng.standard_normal((1, h, w, 6)), jnp.float32)
    init_in = jnp.zeros((1, 256, 256, 6), jnp.float32)

    def bench(f, *fargs, name=""):
        # two warmup rounds: first compiles, second absorbs post-compile
        # slow-path effects observed on the shared pool
        float(jnp.sum(f(*fargs)))
        float(jnp.stack([jnp.sum(f(*fargs)) for _ in range(2)]).sum())
        t0 = time.time()
        outs = [f(*fargs) for _ in range(args.iters)]
        float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        print("%-22s %.1f ms" % (name, (time.time() - t0) / args.iters * 1e3))

    im = jnp.asarray(rng.standard_normal((1, h + 50, w + 50, 1)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, h, w, 51)), jnp.float32) / 51
    hk = jnp.asarray(rng.standard_normal((1, h, w, 51)), jnp.float32) / 51
    bench(jax.jit(sepconv), im, v, hk, name="sepconv (1ch, K=51)")

    m = IFNet(51, 1)
    vi = jax.jit(m.init)(key, init_in)
    bench(jax.jit(lambda vv, x: m.apply(vv, x)), vi, x6, name="IFNet fwd")

    fm = FusionNet(output_nc=2)
    vf = jax.jit(lambda k, x: fm.init(k, x, train=True))(key, init_in)
    bench(jax.jit(lambda vv, x: fm.apply(vv, x, train=False)), vf, x6,
          name="FusionNet fwd")

    um = UNetSFF(1)
    vu = jax.jit(lambda k, x: um.init(k, x, train=True))(key, init_in)
    bench(jax.jit(lambda vv, x: um.apply(vv, x, train=False)), vu, x6,
          name="UNetSFF fwd")

    flow = jnp.zeros((1, h, w, 2), jnp.float32)
    bench(jax.jit(spatial_transform), x6[..., 0:1], flow, name="warp (1ch)")


if __name__ == "__main__":
    main()
