"""Packed 2x deconv kernel vs the ConvTranspose oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sstem_tpu.kernels.conv3x3 import fold_affine, pack_nhwc, unpack_nhwc
from sstem_tpu.kernels.deconv import (
    build_packed_deconv_weights,
    deconv2x_packed,
    deconv2x_reference,
)

RNG = np.random.default_rng(5)


def _mk(shape, scale=1.0):
    return jnp.asarray(RNG.standard_normal(shape) * scale, jnp.float32)


@pytest.mark.parametrize("cin", [64, 128])
def test_deconv_matches_reference(cin):
    cout = cin // 2
    n, h, w = 2, 16, 128
    x = _mk((n, h, w, cin))
    wk = _mk((3, 3, cout, cin), 1.0 / (2 * np.sqrt(cin)))
    b = _mk((cout,), 0.3)
    bs = jnp.abs(_mk((cout,), 0.2)) + 0.8
    bt = _mk((cout,), 0.2)

    want = deconv2x_reference(x, wk, b, bs, bt, act="relu")

    xq = pack_nhwc(x.astype(jnp.bfloat16))
    r = build_packed_deconv_weights(wk.astype(jnp.bfloat16), cin)
    sc, sh = fold_affine(cout, b, bs, bt)
    p_in = 128 // cin
    yq = deconv2x_packed(xq, r, sc, sh, act="relu", wq=w // p_in,
                         interpret=True)
    y = unpack_nhwc(yq, cout, 2 * w)
    assert y.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want), atol=0.05, rtol=0.05)


def test_deconv_skip_half_residual():
    """FusionNet skip: (relu(BN(deconv(x))) + down) / 2 fused."""
    cin, cout = 64, 32
    n, h, w = 1, 8, 64
    x = _mk((n, h, w, cin))
    down = _mk((n, 2 * h, 2 * w, cout))
    wk = _mk((3, 3, cout, cin), 0.1)
    b = _mk((cout,), 0.3)

    want = (deconv2x_reference(x, wk, b, act="relu") + down) / 2

    xq = pack_nhwc(x.astype(jnp.bfloat16))
    dq = pack_nhwc(down.astype(jnp.bfloat16))
    r = build_packed_deconv_weights(wk.astype(jnp.bfloat16), cin)
    sc, sh = fold_affine(cout, b)
    yq = deconv2x_packed(xq, r, sc, sh, act="relu", wq=w // 2,
                         residual=dq, res_mode="post_act_half",
                         interpret=True)
    y = unpack_nhwc(yq, cout, 2 * w)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want), atol=0.05, rtol=0.05)
