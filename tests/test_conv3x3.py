"""Packed fused conv3x3 kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sstem_tpu.kernels.conv3x3 import (
    build_packed_weights,
    conv3x3_fused,
    conv3x3_packed,
    conv3x3_reference,
    fold_affine,
    pack_nhwc,
    unpack_nhwc,
)

RNG = np.random.default_rng(7)


def _mk(shape, scale=1.0):
    return jnp.asarray(RNG.standard_normal(shape) * scale, jnp.float32)


@pytest.mark.parametrize("c", [32, 64, 128])
def test_packed_matches_reference(c):
    n, h, w = 2, 24, 256
    x = _mk((n, h, w, c))
    wk = _mk((3, 3, c, c), 1.0 / (3 * np.sqrt(c)))
    y_ref = conv3x3_reference(x, wk)
    y = conv3x3_fused(x, wk, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref), atol=0.05, rtol=0.05)
    # borders exercise the zero-pad path: check them exactly-ish
    np.testing.assert_allclose(
        np.asarray(y[:, 0, :, :], np.float32), np.asarray(y_ref[:, 0, :, :]),
        atol=0.05, rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(y[:, :, -1, :], np.float32),
        np.asarray(y_ref[:, :, -1, :]), atol=0.05, rtol=0.05)


def test_fused_affine_and_act():
    c, n, h, w = 64, 1, 16, 128
    x = _mk((n, h, w, c))
    wk = _mk((3, 3, c, c), 1.0 / (3 * np.sqrt(c)))
    bias = _mk((c,), 0.5)
    bn_scale = jnp.abs(_mk((c,), 0.3)) + 0.5
    bn_shift = _mk((c,), 0.2)
    for act in (None, "relu", "leaky"):
        y_ref = conv3x3_reference(x, wk, bias, bn_scale, bn_shift, act)
        y = conv3x3_fused(x, wk, bias, bn_scale, bn_shift, act,
                          interpret=True)
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(y_ref),
            atol=0.05, rtol=0.05)


def test_input_channel_padding():
    """6-channel input consumed by a 32-channel conv (first layers)."""
    n, h, w = 1, 16, 128
    x = _mk((n, h, w, 6))
    wk = _mk((3, 3, 6, 32), 0.2)
    y_ref = conv3x3_reference(x, wk)
    y = conv3x3_fused(x, wk, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref), atol=0.05, rtol=0.05)


def test_pack_unpack_roundtrip():
    x = _mk((2, 8, 64, 32))
    xq = pack_nhwc(x)
    assert xq.shape == (2, 8, 32, 128)  # rup(16 + 2, 16)
    assert float(jnp.abs(xq[:, :, 0]).max()) == 0.0
    assert float(jnp.abs(xq[:, :, 17:]).max()) == 0.0
    np.testing.assert_array_equal(np.asarray(unpack_nhwc(xq, 32, 64)),
                                  np.asarray(x))


def test_chained_packed_calls_keep_border():
    """Two chained packed convs (no unpack between) match two XLA convs."""
    c, n, h, w = 32, 1, 16, 128
    x = _mk((n, h, w, c))
    w1 = _mk((3, 3, c, c), 1.0 / (3 * np.sqrt(c)))
    w2 = _mk((3, 3, c, c), 1.0 / (3 * np.sqrt(c)))
    y_ref = conv3x3_reference(conv3x3_reference(x, w1, act="relu"), w2)

    p = 128 // c
    xq = pack_nhwc(x.astype(jnp.bfloat16))
    sc, sh = fold_affine(c)
    r1 = build_packed_weights(w1.astype(jnp.bfloat16), p)
    r2 = build_packed_weights(w2.astype(jnp.bfloat16), p)
    yq = conv3x3_packed(xq, r1, sc, sh, act="relu", wq=w // p,
                        interpret=True)
    yq = conv3x3_packed(yq, r2, sc, sh, wq=w // p, interpret=True)
    y = unpack_nhwc(yq, c, w)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref), atol=0.1, rtol=0.1)
