"""Warp formulation experiments at the bench shape (round-3 perf).

Variants of the corner-packed gather of ops/warp.py::spatial_transform,
all bit-exact candidates, timed on hardware:
  v0: current (f32 table (N, M, 4), take_along_axis)
  v1: uint8 corner table (the warped image is uint8/255 exactly in the
      pipeline, so gathering uint8 corners and scaling after is exact)
  v2: f32 table padded to 8 corners (wider slices per index)
  v3: flat one-channel table, 4 separate gathers (the old formulation)
  v4: int32-packed 4xuint8 corners in ONE lane (quarter index count)
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
    args = parser.parse_args()

    cfg.set_matmul_precision("default")
    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    n, h, w = args.batch, args.size, args.size
    rng = np.random.default_rng(0)
    im_u8 = rng.integers(0, 256, (n, h, w, 1), np.uint8)
    im = jnp.asarray(im_u8, jnp.float32) / 255.0
    flow = jnp.asarray(rng.standard_normal((n, h, w, 2)), jnp.float32) * 3

    def bench(f, *fargs, name=""):
        def sync(o):
            return float(jnp.sum(o.astype(jnp.float32)))
        sync(f(*fargs))
        for _ in range(10):
            sync(f(*fargs))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.iters):
                sync(f(*fargs))
            best = min(best, (time.time() - t0) / args.iters / n * 1e3)
        print("%-34s %7.2f ms/section" % (name, best), flush=True)
        return best

    from sstem_tpu.ops import spatial_transform

    ref = jax.jit(spatial_transform)(im, flow)
    bench(jax.jit(spatial_transform), im, flow, name="v0 current (f32 x4 table)")

    ph, pw = h + 2, w + 2

    def indices_weights(flow):
        gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        x = (flow[..., 0] + gx + 1.0).reshape(n, -1)
        y = (flow[..., 1] + gy + 1.0).reshape(n, -1)
        x0u = jnp.floor(x).astype(jnp.int32)
        y0u = jnp.floor(y).astype(jnp.int32)
        x1c = jnp.clip(x0u + 1, 0, pw - 1)
        y1c = jnp.clip(y0u + 1, 0, ph - 1)
        x0c = jnp.clip(x0u, 0, pw - 1)
        y0c = jnp.clip(y0u, 0, ph - 1)
        flat = y0c * pw + x0c
        dx = (x1c.astype(jnp.float32) - x)[..., None]
        dy = (y1c.astype(jnp.float32) - y)[..., None]
        fx = (x1c != x0c + 1)[..., None]
        fy = (y1c != y0c + 1)[..., None]
        return flat, dx, dy, fx, fy

    def combine(corners, dx, dy, fx, fy):
        ia = corners[..., 0:1]
        ib = corners[..., 1:2]
        ic = corners[..., 2:3]
        id_ = corners[..., 3:4]
        ic = jnp.where(fx, ia, ic)
        id_ = jnp.where(fx, ib, id_)
        ib = jnp.where(fy, ia, ib)
        id_ = jnp.where(fy, ic, id_)
        out = (dx * dy * ia + dx * (1 - dy) * ib
               + (1 - dx) * dy * ic + (1 - dx) * (1 - dy) * id_)
        return out.reshape(n, h, w, 1)

    def table_u8(imu8):
        padded = jnp.pad(imu8[..., 0], [(0, 0), (1, 2), (1, 2)])
        t = jnp.stack([
            padded[:, :ph, :pw], padded[:, 1:ph + 1, :pw],
            padded[:, :ph, 1:pw + 1], padded[:, 1:ph + 1, 1:pw + 1],
        ], axis=-1)
        return t.reshape(imu8.shape[0], ph * pw, 4)

    imu8_dev = jnp.asarray(im_u8)

    def v1(imu8, flow):
        flat, dx, dy, fx, fy = indices_weights(flow)
        t = table_u8(imu8)
        corners = jnp.take_along_axis(t, flat[..., None], axis=1)
        return combine(corners.astype(jnp.float32) / 255.0, dx, dy, fx, fy)

    out1 = jax.jit(v1)(imu8_dev, flow)
    err = float(jnp.max(jnp.abs(out1 - ref)))
    bench(jax.jit(v1), imu8_dev, flow, name=f"v1 uint8 table (err {err:.1e})")

    def v2(im, flow):
        flat, dx, dy, fx, fy = indices_weights(flow)
        padded = jnp.pad(im[..., 0], [(0, 0), (1, 2), (1, 2)])
        t = jnp.stack([
            padded[:, :ph, :pw], padded[:, 1:ph + 1, :pw],
            padded[:, :ph, 1:pw + 1], padded[:, 1:ph + 1, 1:pw + 1],
        ], axis=-1)
        t = jnp.pad(t, [(0, 0), (0, 0), (0, 0), (0, 4)])
        t = t.reshape(im.shape[0], ph * pw, 8)
        corners = jnp.take_along_axis(t, flat[..., None], axis=1)[..., :4]
        return combine(corners, dx, dy, fx, fy)

    out2 = jax.jit(v2)(im, flow)
    err = float(jnp.max(jnp.abs(out2 - ref)))
    bench(jax.jit(v2), im, flow, name=f"v2 f32 8-wide table (err {err:.1e})")

    def v4(imu8, flow):
        flat, dx, dy, fx, fy = indices_weights(flow)
        t = table_u8(imu8).astype(jnp.uint32)
        packed = (t[..., 0] | (t[..., 1] << 8) | (t[..., 2] << 16)
                  | (t[..., 3] << 24))
        g = jnp.take_along_axis(packed, flat, axis=1)
        corners = jnp.stack([
            g & 0xFF, (g >> 8) & 0xFF, (g >> 16) & 0xFF, (g >> 24) & 0xFF,
        ], axis=-1).astype(jnp.float32) / 255.0
        return combine(corners, dx, dy, fx, fy)

    out4 = jax.jit(v4)(imu8_dev, flow)
    err = float(jnp.max(jnp.abs(out4 - ref)))
    bench(jax.jit(v4), imu8_dev, flow,
          name=f"v4 int32-packed u8 (err {err:.1e})")


if __name__ == "__main__":
    main()
