"""Attribute IFNet forward time to stages by timing jitted prefixes (TPU).

Each prefix re-runs the model up to a named cut point; successive diffs
approximate per-stage cost in context (XLA fusion included).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    import sstem_tpu.config as cfg
    from sstem_tpu.models import IFNet
    from sstem_tpu.models.ifnet import _ConvModule, _UpsampleModule, _KernelHead
    from sstem_tpu.models.layers import avg_pool_2x2
    from sstem_tpu.ops import replication_pad_2d
    from sstem_tpu.kernels import sepconv

    cfg.set_matmul_precision("default")
    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    h = w = 1280
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x6 = jnp.asarray(rng.standard_normal((1, h, w, 6)), jnp.float32)

    m = IFNet(51, 1)
    variables = jax.jit(m.init)(key, jnp.zeros((1, 256, 256, 6), jnp.float32))

    class IFNetPrefix(nn.Module):
        upto: str = "full"

        @nn.compact
        def __call__(self, x):
            i1 = x[..., 0:1]
            i2 = x[..., 3:4]
            x = _ConvModule(32, name="conv32")(x)
            if self.upto == "L0":
                return x
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
            if self.upto == "enc":
                return x
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
            x = x + x64
            if self.upto == "dec":
                return x
            heads = {}
            for nm in ("head2h", "head2v", "head1h", "head1v"):
                heads[nm] = _KernelHead(51, name=nm)(x)
            if self.upto == "heads":
                return sum(jnp.sum(hh) for hh in heads.values())
            padded_i1 = replication_pad_2d(i1, 25)
            padded_i2 = replication_pad_2d(i2, 25)
            y = sepconv(padded_i2, heads["head2v"], heads["head2h"]) + \
                sepconv(padded_i1, heads["head1v"], heads["head1h"])
            return y

    def prefix(upto):
        pm = IFNetPrefix(upto=upto)

        def fn(v, x):
            return pm.apply(v, x)

        return jax.jit(fn)

    def bench(f, name):
        float(jnp.sum(f(variables, x6)))
        float(jnp.sum(f(variables, x6)))
        t0 = time.time()
        outs = [f(variables, x6) for _ in range(8)]
        float(jnp.stack([jnp.sum(o) for o in outs]).sum())
        dt = (time.time() - t0) / 8 * 1e3
        print("%-10s %8.2f ms" % (name, dt))
        return dt

    for stage in ("L0", "enc", "dec", "heads", "full"):
        bench(prefix(stage), stage)


if __name__ == "__main__":
    main()
