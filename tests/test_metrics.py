"""Metric parity tests: host reference-exact formulas vs device jnp variants."""

import numpy as np
import pytest

import jax.numpy as jnp

from sstem_tpu import metrics

RNG = np.random.default_rng(1)


def test_compute_psnr_identical_quirk():
    img = RNG.integers(0, 255, (32, 32)).astype(np.float64)
    # mse < 1e-10 -> bare scalar (reference quirk, psnr_ssim.py:16-17)
    assert metrics.compute_psnr(img, img) == 1000000000000


def test_compute_psnr_value():
    a = np.zeros((10, 10))
    b = np.ones((10, 10)) * 255.0
    mse, p = metrics.compute_psnr(a, b)
    assert np.isclose(mse, 1.0)
    assert np.isclose(p, 0.0)


def test_compute_psnr_normalized_inputs():
    a = RNG.uniform(0, 1, (16, 16))
    b = np.clip(a + 0.1, 0, 1.0)
    out = metrics.compute_psnr(a, b)
    mse, p = out
    assert np.isclose(mse, np.mean((a - b) ** 2))


def test_matlab_gauss_window():
    w = metrics.matlab_style_gauss2d((11, 11), 1.5)
    assert np.isclose(w.sum(), 1.0)
    assert w[5, 5] == w.max()
    np.testing.assert_allclose(w, w.T)


def test_compute_ssim_self_is_one():
    img = RNG.integers(0, 255, (64, 64)).astype(np.uint8)
    assert np.isclose(metrics.compute_ssim(img, img), 1.0)


def test_compute_ssim_degrades():
    img = RNG.integers(0, 255, (64, 64)).astype(np.uint8)
    noisy = np.clip(img + RNG.normal(0, 25, img.shape), 0, 255).astype(np.uint8)
    s = metrics.compute_ssim(img, noisy)
    assert 0 < s < 0.99


def test_jnp_psnr_matches_host():
    a = RNG.uniform(0, 1, (32, 32)).astype(np.float32)
    b = np.clip(a + RNG.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    _, ref = metrics.compute_psnr(a, b)
    got = float(metrics.psnr(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
    assert np.isclose(got, ref, atol=1e-3)


def test_jnp_ssim_matches_host():
    a = RNG.integers(0, 255, (48, 48)).astype(np.uint8)
    b = np.clip(a + RNG.normal(0, 15, a.shape), 0, 255).astype(np.uint8)
    ref = metrics.compute_ssim(a, b)
    got = float(metrics.ssim(jnp.asarray(a.astype(np.float64)), jnp.asarray(b.astype(np.float64))))
    assert np.isclose(got, ref, atol=1e-4)


def test_calculate_psnr_ssim_sp_dialect():
    a = RNG.integers(0, 255, (40, 40)).astype(np.uint8)
    assert metrics.calculate_psnr(a, a) == float("inf")
    assert np.isclose(metrics.calculate_ssim(a, a), 1.0)
    b = np.clip(a.astype(int) + 20, 0, 255).astype(np.uint8)
    assert metrics.calculate_psnr(a, b) < 30
    # 3-channel path
    a3 = np.stack([a] * 3, axis=-1)
    b3 = np.stack([b] * 3, axis=-1)
    assert np.isclose(metrics.calculate_ssim(a3, b3), metrics.calculate_ssim(a, b))


def test_cv2_gaussian_kernel_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    ref = cv2.getGaussianKernel(11, 1.5)
    got = metrics._cv2_gaussian_kernel(11, 1.5)
    np.testing.assert_allclose(got, ref, atol=1e-12)
