"""Bilinear upsampling with ``align_corners=True`` semantics.

The reference uses ``nn.Upsample(scale_factor=2, mode='bilinear',
align_corners=True)`` throughout the IFNet decoder
(sff_scripts_interp/model/model_interp.py:18) and the SP U-Net up path
(sp_scripts_train/networks.py:214). ``jax.image.resize`` has no align_corners
mode, so we build the two-tap interpolation explicitly: gather the floor/ceil
source rows/cols and lerp. Pure VPU work, exact f32 (no MXU bf16 rounding),
and XLA fuses it with surrounding ops.
"""

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _taps(in_size: int, out_size: int):
    """(lo_idx, hi_idx, frac) for 1-D align_corners bilinear resize."""
    if out_size == 1 or in_size == 1:
        lo = np.zeros(out_size, np.int32)
        return lo, lo, np.zeros(out_size, np.float32)
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size) * scale
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1).astype(np.int32)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def upsample_bilinear_align_corners(x, scale_factor: int = 2, out_hw=None):
    """Bilinear resize of NHWC input with align_corners=True (torch parity).

    Args:
      x: (N, H, W, C) array.
      scale_factor: integer upscale factor (ignored if out_hw given).
      out_hw: optional explicit (out_h, out_w).
    """
    n, h, w, c = x.shape
    if out_hw is None:
        oh, ow = h * scale_factor, w * scale_factor
    else:
        oh, ow = out_hw

    lo, hi, frac = _taps(h, oh)
    fr = jnp.asarray(frac)[None, :, None, None].astype(x.dtype)
    x = jnp.take(x, jnp.asarray(lo), axis=1) * (1 - fr) + jnp.take(
        x, jnp.asarray(hi), axis=1
    ) * fr

    lo, hi, frac = _taps(w, ow)
    fr = jnp.asarray(frac)[None, None, :, None].astype(x.dtype)
    x = jnp.take(x, jnp.asarray(lo), axis=2) * (1 - fr) + jnp.take(
        x, jnp.asarray(hi), axis=2
    ) * fr
    return x
