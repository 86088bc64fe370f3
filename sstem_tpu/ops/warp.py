"""Differentiable backward image warping.

Two boundary dialects exist in the reference and both matter for parity:

* ``image_warp`` — edge-clamped gather, matching the numpy warp used by the
  simulators and preview paths (simu_sff/image_warp.py:3-112). Quirk preserved:
  the +1 neighbor index is computed from the *clamped* base index
  (image_warp.py:84-88), so out-of-range coordinates on the low side sample
  pixels 0 and 1 rather than 0 twice.
* ``spatial_transform`` — zero-pads the image by one pixel on each side and
  shifts coordinates by +1 before the gather, matching the torch
  ``SpatialTransformation`` module used by the unfolding/fusion pipelines
  (sff_scripts_unfolding/utils/image_warp_torch.py:5-113). The zero border is
  load-bearing: the fusion stitching mask thresholds the warped image at 2/255
  (sff_scripts_fusion/inference.py:167-171).

Both are pure jnp (gather-based) and differentiable w.r.t. image and flow.
"""

import jax.numpy as jnp


def _flat_gather(im_flat, idx):
    # im_flat: (N*H*W, C); idx: (N*H*W,) int32
    return jnp.take(im_flat, idx, axis=0)


def image_warp(im, flow, mode: str = "bilinear"):
    """Backward-warp ``im`` by ``flow`` with edge-clamped sampling.

    Args:
      im: (N, H, W, C) array (any float/int dtype; promoted to float32).
      flow: (N, H, W, 2) array; channel 0 is dx (x-displacement), 1 is dy.
      mode: 'bilinear' or 'nearest'.

    Returns:
      (N, H, W, C) float32 warped image. Cast/truncate at the call site if
      uint8 output parity is needed (the reference returns ``astype(uint8)``).
    """
    n, h, w, c = im.shape
    im_f = im.astype(jnp.float32).reshape(-1, c)
    fx = flow[..., 0].reshape(-1)
    fy = flow[..., 1].reshape(-1)

    gx = jnp.tile(jnp.arange(w, dtype=jnp.int32), (n * h,)).reshape(-1)
    gy = jnp.tile(
        jnp.repeat(jnp.arange(h, dtype=jnp.int32), w), (n,)
    ).reshape(-1)
    base = jnp.repeat(jnp.arange(n, dtype=jnp.int32) * (h * w), h * w)

    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    x0 = jnp.clip(gx + x0f.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(gy + y0f.astype(jnp.int32), 0, h - 1)

    if mode == "nearest":
        out = _flat_gather(im_f, base + y0 * w + x0)
    elif mode == "bilinear":
        # Reference quirk: +1 applied to the already-clamped base index.
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        xw = (fx - x0f)[:, None]
        yw = (fy - y0f)[:, None]
        ia = _flat_gather(im_f, base + y0 * w + x0)
        ib = _flat_gather(im_f, base + y1 * w + x0)
        ic = _flat_gather(im_f, base + y0 * w + x1)
        id_ = _flat_gather(im_f, base + y1 * w + x1)
        out = (
            (1 - xw) * (1 - yw) * ia
            + (1 - xw) * yw * ib
            + xw * (1 - yw) * ic
            + xw * yw * id_
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return out.reshape(n, h, w, c)


def spatial_transform(im, flow):
    """Torch-``SpatialTransformation``-parity warp (zero 1-px border).

    Args:
      im: (N, H, W, C) array.
      flow: (N, H, W, 2); channel 0 dx, channel 1 dy.

    Returns:
      (N, H, W, C) float32 warped image.
    """
    n, h, w, c = im.shape
    padded = jnp.pad(
        im.astype(jnp.float32), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    ph, pw = h + 2, w + 2

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = (flow[..., 0] + gx + 1.0).reshape(-1)
    y = (flow[..., 1] + gy + 1.0).reshape(-1)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, pw - 1)
    y1 = jnp.clip(y0 + 1, 0, ph - 1)
    x0 = jnp.clip(x0, 0, pw - 1)
    y0 = jnp.clip(y0, 0, ph - 1)

    base = jnp.repeat(jnp.arange(n, dtype=jnp.int32) * (ph * pw), h * w)
    im_flat = padded.reshape(-1, c)

    ia = _flat_gather(im_flat, base + y0 * pw + x0)
    ib = _flat_gather(im_flat, base + y1 * pw + x0)
    ic = _flat_gather(im_flat, base + y0 * pw + x1)
    id_ = _flat_gather(im_flat, base + y1 * pw + x1)

    dx = (x1.astype(jnp.float32) - x)[:, None]
    dy = (y1.astype(jnp.float32) - y)[:, None]
    out = dx * dy * ia + dx * (1 - dy) * ib + (1 - dx) * dy * ic + (1 - dx) * (1 - dy) * id_
    return out.reshape(n, h, w, c)
