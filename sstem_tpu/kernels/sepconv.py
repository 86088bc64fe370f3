"""Adaptive separable convolution (KPN apply) — Pallas TPU kernel + XLA oracle.

This is the one native kernel in the reference framework (a CUDA kernel,
libs/sepconv/src/SeparableConvolution_kernel.cu:25-52):

    out[n, y, x, c] = sum_u sum_v  im[n, y+u, x+v, c] * V[n, y, x, u] * H[n, y, x, v]

with the shape contract ``im_spatial = out_spatial + K - 1`` (the model
replication-pads each source frame by K//2 first,
libs/sepconv/SeparableConvolution.py:29-31).

TPU design notes (not a CUDA translation):
  * Per-pixel filters mean no weight sharing, so this is VPU (vector unit)
    work, not MXU. The kernel tiles the output rows (and columns when the
    section is wide), keeps the (K-1)-halo input window in VMEM (DMA'd from
    HBM per tile), and runs the K x K accumulation as vector FMAs over
    (TILE_H, TILE_W) planes.
  * The horizontal taps are applied as STATIC unaligned lane slices
    ``win[:, :, v:v+w]`` — Mosaic lowers these to lane shifts directly,
    which measures ~1.7x faster than the roll-based loop this replaces
    (12.8 ms vs 21.5 ms for K=51 @ 1280^2 on v5e).
  * The NATIVE layout is planar: image (N, C, Hp, Wp), filter maps
    (N, K, H, W). Full-width (H, W) planes put the section width in the
    lane dimension (no lane padding waste at any K), and the IFNet packed
    path emits its tap maps directly in this layout from the head convs
    (dimension_numbers NHWC->NCHW), eliminating the ~30 ms/section NHWC ->
    planar relayout the NHWC API pays. ``sepconv`` keeps the model-native
    NHWC surface and transposes at the boundary.

Gradient semantics: the reference backward computes dV and dH only; the input
gradient is allocated, zeroed, and returned without ever being written
(SeparableConvolution.py:60,76 — dInput is silently zero). We reproduce that
contract (both layouts) so training dynamics match.
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
# XLA oracle / fallback (NHWC and planar)
# ---------------------------------------------------------------------------

def sepconv_reference(image, vertical, horizontal):
    """Pure-XLA sepconv. image (N,Hp,Wp,C); vertical/horizontal (N,H,W,K).

    Autodiff-correct out of the box (including the true input gradient);
    serves as the numerical oracle for the Pallas kernel.

    Accumulates in float32 and casts back to the image dtype at exit — the
    same contract as the Pallas kernel — so bf16 serving inputs don't pay
    K*K=2601 taps of bf16 rounding in the "oracle" side (the source of the
    r5 verify-drive divergence on trained checkpoints).
    """
    out_dtype = image.dtype
    image = image.astype(jnp.float32)
    vertical = vertical.astype(jnp.float32)
    horizontal = horizontal.astype(jnp.float32)
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

        b, _ = lax.scan(v_body, jnp.zeros((n, ho, wo, c), jnp.float32), jnp.arange(k))
        return acc + v_u * b, None

    out, _ = lax.scan(u_body, jnp.zeros((n, ho, wo, c), jnp.float32), jnp.arange(k))
    return out.astype(out_dtype)


def sepconv_reference_planar(image, vertical, horizontal):
    """Planar XLA oracle. image (N,C,Hp,Wp); maps (N,K,H,W) -> (N,C,H,W).

    f32 accumulation + cast-back, matching the Pallas kernel contract
    (see sepconv_reference).
    """
    out_dtype = image.dtype
    image = image.astype(jnp.float32)
    vertical = vertical.astype(jnp.float32)
    horizontal = horizontal.astype(jnp.float32)
    n, c, hp, wp = image.shape
    k = vertical.shape[1]
    ho, wo = hp - k + 1, wp - k + 1

    def u_body(acc, u):
        im_u = lax.dynamic_slice_in_dim(image, u, ho, axis=2)
        v_u = lax.dynamic_slice_in_dim(vertical, u, 1, axis=1)  # (N,1,H,W)

        def v_body(hacc, v):
            im_uv = lax.dynamic_slice_in_dim(im_u, v, wo, axis=3)
            h_v = lax.dynamic_slice_in_dim(horizontal, v, 1, axis=1)
            return hacc + im_uv * h_v, None

        b, _ = lax.scan(v_body, jnp.zeros((n, c, ho, wo), jnp.float32), jnp.arange(k))
        return acc + v_u * b, None

    out, _ = lax.scan(u_body, jnp.zeros((n, c, ho, wo), jnp.float32), jnp.arange(k))
    return out.astype(out_dtype)


def _bwd_xla(image, vertical, horizontal, g):
    """dV, dH via the oracle formulation (contract over channels), NHWC.

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


def _bwd_xla_planar(image, vertical, horizontal, g):
    """Planar dV/dH oracle: image (N,C,Hp,Wp), maps/g planar."""
    dv, dh = _bwd_xla(
        jnp.transpose(image, (0, 2, 3, 1)),
        jnp.transpose(vertical, (0, 2, 3, 1)),
        jnp.transpose(horizontal, (0, 2, 3, 1)),
        jnp.transpose(g, (0, 2, 3, 1)),
    )
    return jnp.transpose(dv, (0, 3, 1, 2)), jnp.transpose(dh, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# Pallas TPU kernels (planar layout)
# ---------------------------------------------------------------------------

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped limit


def _unroll(k: int) -> int:
    """Vertical tap-group unroll: the VMEM window rolls up by this many
    sublanes per group; in-group row offsets are static. 51 = 3 * 17."""
    for f in (3, 2):
        if k % f == 0:
            return f
    return 1


def _halo_rows(ty: int, k: int) -> int:
    """VMEM window rows: ty + k - 1, rounded to a sublane (8) multiple."""
    return -(-(ty + k - 1) // 8) * 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tiles(h: int, w: int, k: int, n_map_blocks: int, c: int,
                itemsize: int = 4):
    """(ty, tx) output tile such that the pipelined map blocks + the halo
    window fit the VMEM budget. n_map_blocks counts (1,K,ty,tx) blocks
    held per grid step (2 for fwd: V,H; 4 for bwd: V,H,dV,dH; +1 g block).
    bf16 blocks need a 16-sublane tile; f32 needs 8.
    """
    ty = 16 if itemsize == 2 else 8
    tx = w
    while True:
        txw = _round_up(tx + k - 1, 128)
        # map blocks counted at 4 B/elt regardless of dtype: Mosaic's
        # scoped-vmem accounting for bf16 blocks measures ~2x their packed
        # size (upcast staging), so bf16 budgets as f32
        need = (
            n_map_blocks * 2 * 4 * k * ty * tx      # 2x-buffered maps
            + 2 * 4 * c * _halo_rows(ty, k) * txw   # halo window (f32)
            + 2 * 4 * c * ty * tx                   # output block
        )
        if need <= _VMEM_BUDGET or tx <= 256:
            return ty, tx
        # halve the column tile (keep it a lane multiple)
        tx = max(256, _round_up(tx // 2, 128))


def _col_off(s, tx: int, n_col_tiles: int):
    """Column offset for the halo-window DMA. With one column tile the
    offset is the constant 0 (tx may then be any width); with several, tx
    is a 128-lane multiple by construction, so s*tx is provably aligned."""
    return 0 if n_col_tiles == 1 else s * tx


def _fwd_kernel(k: int, ty: int, tx: int, c: int, n_col_tiles: int,
                im_hbm, v_ref, h_ref, out_ref, scratch, sem):
    """Static-slice accumulation over the VMEM halo window:

        out[c, y, x] = sum_u V[u, y, x] * (sum_v H[v, y, x] * im[c, y+u, x+v])

    Horizontal taps are static lane slices of the window (Mosaic lane
    shifts); vertical taps use static in-group sublane offsets with one
    sublane roll of the window per group.
    """
    n = pl.program_id(0)
    t = pl.program_id(1)
    s = pl.program_id(2)
    rows = _halo_rows(ty, k)
    txw = scratch.shape[-1]
    uu = _unroll(k)
    dma = pltpu.make_async_copy(
        im_hbm.at[n, :, pl.ds(t * ty, rows),
                  pl.ds(_col_off(s, tx, n_col_tiles), txw)],
        scratch, sem,
    )
    dma.start()
    dma.wait()

    # hoist the (bf16) H-plane upcasts out of the tap loops: inside the
    # fori body they re-execute per u-group (measured ~11% of kernel time)
    hf = h_ref[0].astype(jnp.float32)

    def u_group(g, carry):
        acc, win = carry
        for du in range(uu):
            u = g * uu + du
            row = win[:, du:du + ty, :]
            hacc = jnp.zeros((c, ty, tx), jnp.float32)
            for v in range(k):
                hacc = hacc + hf[v][None] * row[:, :, v:v + tx]
            v_u = v_ref[0, u].astype(jnp.float32)
            acc = acc + v_u[None] * hacc
        return acc, pltpu.roll(win, win.shape[1] - uu, 1)

    acc, _ = lax.fori_loop(
        0, k // uu, u_group,
        (jnp.zeros((c, ty, tx), jnp.float32), scratch[...]),
    )
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_kernel(k: int, ty: int, tx: int, c: int, n_col_tiles: int,
                im_hbm, v_ref, h_ref, g_ref, dv_ref, dh_ref, scratch, sem):
    """Static-slice backward: shares s(u,v) = sum_c g * im[y+u, x+v] between
    dV[u] = sum_v H[v] * s(u,v) and dH[v] = sum_u V[u] * s(u,v)."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    sx = pl.program_id(2)
    rows = _halo_rows(ty, k)
    txw = scratch.shape[-1]
    uu = _unroll(k)
    dma = pltpu.make_async_copy(
        im_hbm.at[n, :, pl.ds(t * ty, rows),
                  pl.ds(_col_off(sx, tx, n_col_tiles), txw)],
        scratch, sem,
    )
    dma.start()
    dma.wait()

    g = g_ref[0].astype(jnp.float32)  # (c, ty, tx)
    dh_ref[...] = jnp.zeros_like(dh_ref)
    hf = h_ref[0].astype(jnp.float32)  # hoisted upcast (see _fwd_kernel)

    def u_group(gu, win):
        for du in range(uu):
            u = gu * uu + du
            v_u = v_ref[0, u].astype(jnp.float32)
            row = win[:, du:du + ty, :]
            dv_u = jnp.zeros((ty, tx), jnp.float32)
            for v in range(k):
                s = jnp.sum(g * row[:, :, v:v + tx], axis=0)  # (ty, tx)
                dv_u = dv_u + hf[v] * s
                dh_ref[0, v] = (
                    dh_ref[0, v].astype(jnp.float32) + v_u * s
                ).astype(dh_ref.dtype)
            dv_ref[0, u] = dv_u.astype(dv_ref.dtype)
        return pltpu.roll(win, win.shape[1] - uu, 1)

    lax.fori_loop(0, k // uu, u_group, scratch[...])


def _prep_planar_inputs(image, vertical, horizontal, ty, tx, k):
    """Pad planar inputs for tiling: maps H to a ty multiple and W to a tx
    multiple; image rows for the last DMA window and columns for the last
    column tile's 128-aligned window."""
    n, c, hp, wp = image.shape
    h, w = hp - k + 1, wp - k + 1
    hpad = _round_up(h, ty)
    wq = _round_up(w, tx)
    rows = _halo_rows(ty, k)
    txw = _round_up(tx + k - 1, 128)
    im_rows = hpad - ty + rows
    im_cols = wq - tx + txw
    # the halo window travels f32: pltpu.roll (used for the per-group
    # sublane shift) only supports 32-bit data; the big streams (the K-plane
    # tap maps) keep their caller dtype, so bf16 callers still halve the
    # dominant traffic
    image = jnp.pad(
        image.astype(jnp.float32),
        [(0, 0), (0, 0), (0, im_rows - hp), (0, im_cols - wp)],
    )
    pad_hw = [(0, 0), (0, 0), (0, hpad - h), (0, wq - w)]
    vertical = jnp.pad(vertical, pad_hw)
    horizontal = jnp.pad(horizontal, pad_hw)
    return image, vertical, horizontal, h, w, hpad, wq, txw


def _sepconv_fwd_pallas_planar(image, vertical, horizontal, interpret=False):
    n, c, hp, wp = image.shape
    k = vertical.shape[1]
    h, w = hp - k + 1, wp - k + 1
    ty, tx = _pick_tiles(h, w, k, n_map_blocks=2, c=c,
                         itemsize=min(image.dtype.itemsize,
                                      vertical.dtype.itemsize))
    im_p, v_p, h_p, h, w, hpad, wq, txw = _prep_planar_inputs(
        image, vertical, horizontal, ty, tx, k)

    grid = (n, hpad // ty, wq // tx)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k, ty, tx, c, wq // tx),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, k, ty, tx), lambda i, t, s: (i, 0, t, s)),
            pl.BlockSpec((1, k, ty, tx), lambda i, t, s: (i, 0, t, s)),
        ],
        out_specs=pl.BlockSpec((1, c, ty, tx), lambda i, t, s: (i, 0, t, s)),
        out_shape=jax.ShapeDtypeStruct((n, c, hpad, wq), image.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, _halo_rows(ty, k), txw), im_p.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * hpad * wq * c * k * k,
            bytes_accessed=4 * n * (c * hp * wp + 2 * k * h * w + c * h * w),
            transcendentals=0,
        ),
        interpret=interpret,
    )(im_p, v_p, h_p)
    return out[:, :, :h, :w]


def _sepconv_bwd_pallas_planar(image, vertical, horizontal, g, interpret=False):
    n, c, hp, wp = image.shape
    k = vertical.shape[1]
    h, w = hp - k + 1, wp - k + 1
    ty, tx = _pick_tiles(h, w, k, n_map_blocks=4, c=c,
                         itemsize=min(image.dtype.itemsize,
                                      vertical.dtype.itemsize))
    im_p, v_p, h_p, h, w, hpad, wq, txw = _prep_planar_inputs(
        image, vertical, horizontal, ty, tx, k)
    g_p = jnp.pad(g, [(0, 0), (0, 0), (0, hpad - h), (0, wq - w)])

    grid = (n, hpad // ty, wq // tx)
    dv, dh = pl.pallas_call(
        functools.partial(_bwd_kernel, k, ty, tx, c, wq // tx),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, k, ty, tx), lambda i, t, s: (i, 0, t, s)),
            pl.BlockSpec((1, k, ty, tx), lambda i, t, s: (i, 0, t, s)),
            pl.BlockSpec((1, c, ty, tx), lambda i, t, s: (i, 0, t, s)),
        ],
        out_specs=[
            pl.BlockSpec((1, k, ty, tx), lambda i, t, s: (i, 0, t, s)),
            pl.BlockSpec((1, k, ty, tx), lambda i, t, s: (i, 0, t, s)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k, hpad, wq), vertical.dtype),
            jax.ShapeDtypeStruct((n, k, hpad, wq), horizontal.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, _halo_rows(ty, k), txw), im_p.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(im_p, v_p, h_p, g_p)
    return dv[:, :, :h, :w], dh[:, :, :h, :w]


# ---------------------------------------------------------------------------
# Public ops with reference-parity custom VJP (dInput = 0)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def sepconv_planar(image, vertical, horizontal):
    """Adaptive separable convolution, planar (TPU-native) layout.

    Args:
      image: (N, C, H+K-1, W+K-1) pre-padded source frame.
      vertical: (N, K, H, W) per-pixel vertical filter taps.
      horizontal: (N, K, H, W) per-pixel horizontal filter taps.

    Returns:
      (N, C, H, W) filtered output. Backward produces dV/dH; the image
      gradient is zero, matching the reference CUDA op's (documented)
      behavior (libs/sepconv/SeparableConvolution.py:60,76).
    """
    impl = _resolve_impl()
    if impl == "xla":
        return sepconv_reference_planar(image, vertical, horizontal)
    return _sepconv_fwd_pallas_planar(
        image, vertical, horizontal, interpret=(impl == "pallas_interpret")
    )


def _sepconv_planar_vjp_fwd(image, vertical, horizontal):
    return sepconv_planar(image, vertical, horizontal), (image, vertical, horizontal)


def _sepconv_planar_vjp_bwd(res, g):
    image, vertical, horizontal = res
    impl = _resolve_impl()
    if impl == "xla":
        dv, dh = _bwd_xla_planar(image, vertical, horizontal, g)
    else:
        dv, dh = _sepconv_bwd_pallas_planar(
            image, vertical, horizontal, g, interpret=(impl == "pallas_interpret")
        )
    return jnp.zeros_like(image), dv, dh


sepconv_planar.defvjp(_sepconv_planar_vjp_fwd, _sepconv_planar_vjp_bwd)


@jax.custom_vjp
def sepconv(image, vertical, horizontal):
    """Adaptive separable convolution (NHWC model-native surface).

    Args:
      image: (N, H+K-1, W+K-1, C) pre-padded source frame.
      vertical: (N, H, W, K) per-pixel vertical filter taps.
      horizontal: (N, H, W, K) per-pixel horizontal filter taps.

    Returns:
      (N, H, W, C) filtered output. Backward produces dV/dH; the image
      gradient is zero (reference contract). On TPU this pays an NHWC ->
      planar relayout at the boundary; performance-critical callers (the
      IFNet packed path) use ``sepconv_planar`` with maps emitted planar.
    """
    impl = _resolve_impl()
    if impl == "xla":
        return sepconv_reference(image, vertical, horizontal)
    out = _sepconv_fwd_pallas_planar(
        jnp.transpose(image, (0, 3, 1, 2)),
        jnp.transpose(vertical, (0, 3, 1, 2)),
        jnp.transpose(horizontal, (0, 3, 1, 2)),
        interpret=(impl == "pallas_interpret"),
    )
    return jnp.transpose(out, (0, 2, 3, 1))


def _sepconv_vjp_fwd(image, vertical, horizontal):
    return sepconv(image, vertical, horizontal), (image, vertical, horizontal)


def _sepconv_vjp_bwd(res, g):
    image, vertical, horizontal = res
    impl = _resolve_impl()
    if impl == "xla":
        dv, dh = _bwd_xla(image, vertical, horizontal, g)
    else:
        dv_p, dh_p = _sepconv_bwd_pallas_planar(
            jnp.transpose(image, (0, 3, 1, 2)),
            jnp.transpose(vertical, (0, 3, 1, 2)),
            jnp.transpose(horizontal, (0, 3, 1, 2)),
            jnp.transpose(g, (0, 3, 1, 2)),
            interpret=(impl == "pallas_interpret"),
        )
        dv = jnp.transpose(dv_p, (0, 2, 3, 1))
        dh = jnp.transpose(dh_p, (0, 2, 3, 1))
    return jnp.zeros_like(image), dv, dh


sepconv.defvjp(_sepconv_vjp_fwd, _sepconv_vjp_bwd)


def _sepconv_bwd_pallas(image, vertical, horizontal, g, interpret=False):
    """NHWC wrapper over the planar backward kernel (tests/back-compat)."""
    dv_p, dh_p = _sepconv_bwd_pallas_planar(
        jnp.transpose(image, (0, 3, 1, 2)),
        jnp.transpose(vertical, (0, 3, 1, 2)),
        jnp.transpose(horizontal, (0, 3, 1, 2)),
        jnp.transpose(g, (0, 3, 1, 2)),
        interpret=interpret,
    )
    return jnp.transpose(dv_p, (0, 2, 3, 1)), jnp.transpose(dh_p, (0, 2, 3, 1))


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
