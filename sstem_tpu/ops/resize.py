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

import jax

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


@functools.lru_cache(maxsize=64)
def _shift_weights_2x(in_size: int):
    """For exact 2x upsampling, decompose the two-tap lerp into three
    shifted repeat-interleave views: out[o] = sum_s w_s[o] * x[clip(o//2+s)].

    The source index lo(o) = floor(o*(in-1)/(2*in-1)) drifts from o//2 by at
    most 1, so {-1, 0, +1} shifts cover every tap. Repeats + elementwise
    FMAs replace the gathers (TPU gathers are slow; repeats are relayouts).
    """
    out_size = 2 * in_size
    lo, hi, frac = _taps(in_size, out_size)
    base = np.arange(out_size) // 2
    weights = []
    for s in (-1, 0, 1):
        # exact (unclipped) offsets: lo-base in {-1,0}, hi-base in {0,1},
        # so each tap lands on exactly one shift (no clip collisions)
        w = np.where(lo - base == s, 1.0 - frac, 0.0)
        w = w + np.where(hi - base == s, frac, 0.0)
        weights.append(w.astype(np.float32))
    return weights


def _upsample2x_axis(x, axis):
    h = x.shape[axis]
    weights = _shift_weights_2x(h)
    out = None
    for s, w in zip((-1, 0, 1), weights):
        idx = np.clip(np.arange(h) + s, 0, h - 1)
        if s == 0:
            shifted = x
        elif s == -1:
            shifted = jnp.concatenate(
                [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
                 jax.lax.slice_in_dim(x, 0, h - 1, axis=axis)], axis=axis)
        else:
            shifted = jnp.concatenate(
                [jax.lax.slice_in_dim(x, 1, h, axis=axis),
                 jax.lax.slice_in_dim(x, h - 1, h, axis=axis)], axis=axis)
        view = jnp.repeat(shifted, 2, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = 2 * h
        wv = jnp.asarray(w).reshape(shape).astype(x.dtype)
        term = view * wv
        out = term if out is None else out + term
    return out


def upsample2x_planar(x):
    """Exact-2x align_corners bilinear resize of planar (N, C, H, W) input.

    Same shift-decomposed math as the NHWC fast path, applied on the
    trailing spatial axes. Prefer ``upsample2x_planar_mxu`` on TPU — the
    lane-interleaving repeat this variant does on the minor axis measures
    ~12 ms per 51-channel 640->1280 map on v5e vs ~2-4 ms for the matmul
    form.
    """
    return _upsample2x_axis(_upsample2x_axis(x, 2), 3)


@functools.lru_cache(maxsize=64)
def _up_matrix_2x(in_size: int):
    """Dense (2*in, in) align_corners interpolation matrix (2 taps/row)."""
    out_size = 2 * in_size
    lo, hi, frac = _taps(in_size, out_size)
    u = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(u, (rows, lo), 1.0 - frac)
    np.add.at(u, (rows, hi), frac)
    return u


def upsample2x_planar_mxu(x, precision=None):
    """Exact-2x align_corners bilinear resize of planar input via two
    matmuls with the (sparse, 2-tap) interpolation matrices densified.

    The per-row-varying lerp weights of align_corners make the op a gather
    (slow on TPU) or a lane-interleave (slow on the minor axis); as matmuls
    the MXU eats the ~97% structural zeros and still wins by ~4x. With two
    nonzero terms per output the matmul sum is the same two-term lerp sum,
    so at HIGHEST precision the result matches the shift decomposition.
    """
    n, c, h, w = x.shape
    uh = jnp.asarray(_up_matrix_2x(h), dtype=x.dtype)
    uw = jnp.asarray(_up_matrix_2x(w), dtype=x.dtype)
    y = jnp.einsum("Oh,nchw->ncOw", uh, x, precision=precision)
    return jnp.einsum("ncow,Ww->ncoW", y, uw, precision=precision)


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

    if oh == 2 * h and ow == 2 * w:
        # gather-free fast path for the ubiquitous exact-2x case
        return _upsample2x_axis(_upsample2x_axis(x, 1), 2)

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
