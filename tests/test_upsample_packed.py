"""Packed 2x upsample kernels vs an f64 align-corners oracle (interpret
mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from sstem_tpu.kernels.conv3x3 import (
    build_packed_weights, fold_affine, pack_nhwc, unpack_nhwc)
from sstem_tpu.kernels.upconv3x3 import (
    build_upconv_coeffs, upconv3x3_packed)
from sstem_tpu.kernels.upsample_packed import upsample2x_packed


def _oracle_up(xf, hh, wh):
    """f64 align-corners bilinear x2 (reference semantics:
    model_interp.py:74-83 Upsample(align_corners=True))."""
    H, W = 2 * hh, 2 * wh
    ys = np.arange(H) * (hh - 1) / (H - 1)
    xs = np.arange(W) * (wh - 1) / (W - 1)
    r = np.minimum(np.floor(ys).astype(int), hh - 2)
    wv = ys - r
    l = np.minimum(np.floor(xs).astype(int), wh - 2)
    wu = xs - l
    tmp = (xf[:, r] * (1 - wv)[None, :, None, None]
           + xf[:, r + 1] * wv[None, :, None, None])
    return (tmp[:, :, l] * (1 - wu)[None, None, :, None]
            + tmp[:, :, l + 1] * wu[None, None, :, None])


def test_upsample2x_packed_matches_oracle():
    rng = np.random.default_rng(0)
    for hh, wh in ((16, 64), (24, 128)):
        x = jnp.asarray(rng.random((1, hh, wh, 64)),
                        jnp.float32).astype(jnp.bfloat16)
        xq = pack_nhwc(x)
        yq = upsample2x_packed(xq, wq=wh // 2, interpret=True)
        got = np.asarray(unpack_nhwc(yq, 64, 2 * wh).astype(jnp.float32))
        xf = np.asarray(x.astype(jnp.float32)).astype(np.float64)
        want = _oracle_up(xf, hh, wh)
        # bf16 inputs + f32 blend: tighter than the production MXU
        # upsample's bf16 matmul error
        assert np.abs(got - want).max() < 0.006


def test_upconv3x3_packed_matches_oracle():
    """Fused upsample+conv vs f64-upsample + f32 conv, K=51 channel
    padding included (reference head tail model_interp.py:74-89)."""
    rng = np.random.default_rng(1)
    K = 51
    hh, wh = 16, 64
    x = jnp.asarray(rng.random((1, hh, wh, 64)),
                    jnp.float32).astype(jnp.bfloat16)
    w3 = jnp.asarray((rng.random((3, 3, K, K)) - 0.5) * 0.2, jnp.float32)
    b3 = jnp.asarray(rng.random((K,)) - 0.5, jnp.float32)
    w64 = jnp.pad(w3, [(0, 0), (0, 0), (0, 64 - K), (0, 64 - K)])
    b64 = jnp.pad(b3, [(0, 64 - K)])
    r = build_packed_weights(w64.astype(jnp.bfloat16), 2)
    sc, sh = fold_affine(64, b64)
    cf = build_upconv_coeffs(wh)
    yq = upconv3x3_packed(pack_nhwc(x), r, sc, sh, cf, wq_half=wh // 2,
                          interpret=True)
    got = np.asarray(
        unpack_nhwc(yq, 64, 2 * wh)[..., :K].astype(jnp.float32))
    xf = np.asarray(x.astype(jnp.float32)).astype(np.float64)[..., :K]
    up = _oracle_up(xf, hh, wh)
    want = np.asarray(lax.conv_general_dilated(
        jnp.asarray(up, jnp.float32), w3, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b3)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < 0.005, err
