"""Fine-grained stage profiler at the bench configuration.

Times the production (packed, bf16, batch-4) pipeline pieces separately so
optimization targets the measured hot spot, not folklore:

    python tools/profile_fine.py [--size 1280] [--batch 4] [--iters 6]

Pieces: IFNet trunk (encoder+decoder to x64), the 4 kernel heads, planar
sepconv, full packed IFNet, FusionNet (flow), UNetSFF (fusion), warp.
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

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1280)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--f32", action="store_true")
    args = parser.parse_args()

    cfg.set_matmul_precision("default")
    if not args.f32:
        cfg.set_compute_dtype("bfloat16")
    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    from sstem_tpu.kernels import sepconv_planar
    from sstem_tpu.models import FusionNet, IFNet, UNetSFF
    from sstem_tpu.ops import spatial_transform

    n, h, w = args.batch, args.size, args.size
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x6 = jnp.asarray(rng.standard_normal((n, h, w, 6)), jnp.float32)
    init_in = jnp.zeros((1, 256, 256, 6), jnp.float32)

    def bench(f, *fargs, name=""):
        def sync(outs):
            return float(jnp.stack(
                [jnp.sum(o.astype(jnp.float32)) for o in outs]).sum())
        sync([f(*fargs)])
        sync([f(*fargs) for _ in range(8)])  # post-compile slow path
        t0 = time.time()
        sync([f(*fargs) for _ in range(args.iters)])
        ms = (time.time() - t0) / args.iters / n * 1e3
        print("%-26s %7.1f ms/section" % (name, ms))
        return ms

    model = IFNet(51, 1, packed=True)
    variables = jax.jit(IFNet(51, 1).init)(key, init_in)

    # full packed IFNet
    bench(jax.jit(lambda v, x: model.apply(v, x)), variables, x6,
          name="IFNet packed (full)")

    # trunk only: run __call__ but capture the pre-head feature map via
    # a surgical re-apply of the submodules
    import flax.linen as nn

    class TrunkOnly(nn.Module):
        base: nn.Module

        @nn.compact
        def __call__(self, x):
            # mirror IFNet.__call__ through upsamp64 (models/ifnet.py)
            from sstem_tpu.models.ifnet import _ConvModule, _UpsampleModule
            from sstem_tpu.models.layers import avg_pool_2x2
            x = _ConvModule(32, name="conv32")(x)
            x = avg_pool_2x2(x)
            x64 = _ConvModule(64, name="conv64")(x)
            x128 = avg_pool_2x2(x64)
            x128 = _ConvModule(128, name="conv128")(x128)
            x256 = avg_pool_2x2(x128)
            x256 = _ConvModule(256, name="conv256")(x256)
            x512 = avg_pool_2x2(x256)
            x512 = _ConvModule(512, name="conv512")(x512)
            x = avg_pool_2x2(x512)
            x = _ConvModule(512, name="conv512x512")(x)
            x = _UpsampleModule(512, name="upsamp512")(x)
            x = x + x512
            x = _ConvModule(256, name="upconv256")(x)
            x = _UpsampleModule(256, name="upsamp256")(x)
            x = x + x256
            x = _ConvModule(128, name="upconv128")(x)
            x = _UpsampleModule(128, name="upsamp128")(x)
            x = x + x128
            x = _ConvModule(64, name="upconv64")(x)
            x = _UpsampleModule(64, name="upsamp64")(x)
            return x + x64

    trunk = TrunkOnly(model)
    bench(jax.jit(lambda v, x: trunk.apply(v, x)), variables, x6,
          name="IFNet trunk (to x64)")

    # heads only (packed): one head applied to a trunk-shaped feature map
    from sstem_tpu.models.ifnet import _KernelHead

    feat = jnp.asarray(
        rng.standard_normal((n, h // 2, w // 2, 64)), jnp.float32)
    if not args.f32:
        feat = feat.astype(jnp.bfloat16)
    head = _KernelHead(51, True)
    hv = jax.jit(head.init)(key, feat[:1])
    bench(jax.jit(lambda v, x: head.apply(v, x)), hv, feat,
          name="1 kernel head (packed)")

    # planar sepconv alone
    imp = jnp.asarray(
        rng.standard_normal((n, 1, h + 50, w + 50)), jnp.float32)
    vmap_ = jnp.asarray(
        rng.standard_normal((n, 51, h, w)), jnp.float32) / 51
    hmap_ = jnp.asarray(
        rng.standard_normal((n, 51, h, w)), jnp.float32) / 51
    if not args.f32:
        imp, vmap_, hmap_ = (t.astype(jnp.bfloat16)
                             for t in (imp, vmap_, hmap_))
    bench(jax.jit(sepconv_planar), imp, vmap_, hmap_,
          name="sepconv planar (1ch)")

    fm = FusionNet(output_nc=2)
    vf = jax.jit(lambda k, x: fm.init(k, x, train=True))(key, init_in)
    bench(jax.jit(lambda v, x: fm.apply(v, x, train=False)), vf, x6,
          name="FusionNet (flow)")

    um = UNetSFF(1)
    vu = jax.jit(lambda k, x: um.init(k, x, train=True))(key, init_in)
    bench(jax.jit(lambda v, x: um.apply(v, x, train=False)), vu, x6,
          name="UNetSFF (fusion)")

    flow = jnp.asarray(rng.standard_normal((n, h, w, 2)), jnp.float32) * 3
    bench(jax.jit(spatial_transform), x6[..., 0:1], flow, name="warp (1ch)")


if __name__ == "__main__":
    main()
