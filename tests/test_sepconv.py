"""Sepconv kernel tests: numpy brute-force oracle, XLA path, Pallas (interpret
mode on CPU), VJP contract (dV/dH exact, dImage == 0 per reference semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sstem_tpu.kernels import sepconv, sepconv_reference, set_sepconv_impl
from sstem_tpu.kernels.sepconv import _bwd_xla, sepconv_brute

RNG = np.random.default_rng(7)


def _numpy_oracle(im, v, h):
    n, hp, wp, c = im.shape
    k = v.shape[-1]
    ho, wo = hp - k + 1, wp - k + 1
    out = np.zeros((n, ho, wo, c), np.float64)
    for b in range(n):
        for y in range(ho):
            for x in range(wo):
                win = im[b, y:y + k, x:x + k, :]  # (k,k,c)
                wmat = np.outer(v[b, y, x], h[b, y, x])[:, :, None]
                out[b, y, x] = (win * wmat).sum((0, 1))
    return out


def _rand_case(n=2, h=6, w=7, c=3, k=5):
    im = RNG.standard_normal((n, h + k - 1, w + k - 1, c)).astype(np.float32)
    v = RNG.standard_normal((n, h, w, k)).astype(np.float32)
    hk = RNG.standard_normal((n, h, w, k)).astype(np.float32)
    return im, v, hk


def test_reference_matches_numpy_oracle():
    im, v, h = _rand_case()
    ref = _numpy_oracle(im, v, h)
    got = np.asarray(sepconv_reference(jnp.asarray(im), jnp.asarray(v), jnp.asarray(h)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_brute_matches_reference():
    im, v, h = _rand_case()
    a = np.asarray(sepconv_brute(jnp.asarray(im), jnp.asarray(v), jnp.asarray(h)))
    b = np.asarray(sepconv_reference(jnp.asarray(im), jnp.asarray(v), jnp.asarray(h)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 8, 8, 3, 5), (2, 12, 16, 1, 7), (1, 9, 13, 3, 3)])
def test_pallas_interpret_matches_reference(shape):
    n, h, w, c, k = shape
    im = RNG.standard_normal((n, h + k - 1, w + k - 1, c)).astype(np.float32)
    v = RNG.standard_normal((n, h, w, k)).astype(np.float32)
    hk = RNG.standard_normal((n, h, w, k)).astype(np.float32)
    ref = np.asarray(sepconv_reference(jnp.asarray(im), jnp.asarray(v), jnp.asarray(hk)))
    set_sepconv_impl("pallas_interpret")
    try:
        got = np.asarray(sepconv(jnp.asarray(im), jnp.asarray(v), jnp.asarray(hk)))
    finally:
        set_sepconv_impl("auto")
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_vjp_matches_autodiff_of_reference():
    """dV/dH from the custom VJP == autodiff of the XLA oracle; dImage == 0."""
    im, v, h = _rand_case(n=1, h=5, w=6, c=2, k=3)
    im_j, v_j, h_j = jnp.asarray(im), jnp.asarray(v), jnp.asarray(h)

    def loss_custom(img, vv, hh):
        return jnp.sum(sepconv(img, vv, hh) ** 2)

    def loss_ref(img, vv, hh):
        return jnp.sum(sepconv_reference(img, vv, hh) ** 2)

    set_sepconv_impl("xla")
    try:
        gi, gv, gh = jax.grad(loss_custom, argnums=(0, 1, 2))(im_j, v_j, h_j)
    finally:
        set_sepconv_impl("auto")
    ri, rv, rh = jax.grad(loss_ref, argnums=(0, 1, 2))(im_j, v_j, h_j)

    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(rh), rtol=1e-4, atol=1e-4)
    # Reference CUDA op never writes gradInput -> custom VJP returns zeros
    assert np.all(np.asarray(gi) == 0)
    assert np.any(np.asarray(ri) != 0)  # (the true grad is nonzero)


def test_pallas_interpret_bwd_matches_xla_bwd():
    im, v, h = _rand_case(n=1, h=8, w=8, c=3, k=5)
    g = RNG.standard_normal((1, 8, 8, 3)).astype(np.float32)
    dv_ref, dh_ref = _bwd_xla(
        jnp.asarray(im), jnp.asarray(v), jnp.asarray(h), jnp.asarray(g)
    )

    from sstem_tpu.kernels.sepconv import _sepconv_bwd_pallas

    dv, dh = _sepconv_bwd_pallas(
        jnp.asarray(im), jnp.asarray(v), jnp.asarray(h), jnp.asarray(g),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref), rtol=1e-4, atol=1e-4)


def test_shape_contract():
    """in_spatial = out_spatial + K - 1 (SeparableConvolution.py:29-31)."""
    im, v, h = _rand_case(n=1, h=4, w=4, c=1, k=3)
    out = sepconv_reference(jnp.asarray(im), jnp.asarray(v), jnp.asarray(h))
    assert out.shape == (1, 4, 4, 1)
