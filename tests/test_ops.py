"""Foundation op parity tests (vs torch-cpu oracles and brute-force loops)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sstem_tpu.ops import (
    gen_flow,
    gen_flow_np,
    gen_line,
    image_warp,
    replication_pad_2d,
    spatial_transform,
    upsample_bilinear_align_corners,
)

RNG = np.random.default_rng(0)


def test_replication_pad_matches_torch():
    x = RNG.standard_normal((2, 7, 9, 3)).astype(np.float32)
    got = np.asarray(replication_pad_2d(jnp.asarray(x), 25))
    # torch works in NCHW
    ref = torch.nn.ReplicationPad2d(25)(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@pytest.mark.parametrize("hw", [(8, 8), (7, 9), (16, 32)])
def test_upsample_align_corners_matches_torch(hw):
    h, w = hw
    x = RNG.standard_normal((2, h, w, 4)).astype(np.float32)
    got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 2))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        scale_factor=2,
        mode="bilinear",
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _warp_oracle_edge_clamp(im, flow, mode):
    """Brute-force per-pixel implementation of the reference warp semantics."""
    n, h, w, c = im.shape
    out = np.zeros_like(im, dtype=np.float64)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                fx, fy = flow[b, y, x]
                x0 = int(np.clip(x + np.floor(fx), 0, w - 1))
                y0 = int(np.clip(y + np.floor(fy), 0, h - 1))
                if mode == "nearest":
                    out[b, y, x] = im[b, y0, x0]
                    continue
                x1 = min(x0 + 1, w - 1)
                y1 = min(y0 + 1, h - 1)
                xw = fx - np.floor(fx)
                yw = fy - np.floor(fy)
                out[b, y, x] = (
                    (1 - xw) * (1 - yw) * im[b, y0, x0]
                    + (1 - xw) * yw * im[b, y1, x0]
                    + xw * (1 - yw) * im[b, y0, x1]
                    + xw * yw * im[b, y1, x1]
                )
    return out


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_image_warp_matches_oracle(mode):
    im = RNG.uniform(0, 255, (2, 12, 13, 1)).astype(np.float32)
    flow = RNG.uniform(-6, 6, (2, 12, 13, 2)).astype(np.float32)
    got = np.asarray(image_warp(jnp.asarray(im), jnp.asarray(flow), mode))
    ref = _warp_oracle_edge_clamp(im, flow, mode)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_spatial_transform_matches_oracle():
    """Zero-border torch dialect: pad by 1, shift +1, clamp on padded image."""
    im = RNG.uniform(0, 255, (2, 10, 11, 3)).astype(np.float32)
    flow = RNG.uniform(-5, 5, (2, 10, 11, 2)).astype(np.float32)

    n, h, w, c = im.shape
    padded = np.pad(im, [(0, 0), (1, 1), (1, 1), (0, 0)])
    ph, pw = h + 2, w + 2
    ref = np.zeros_like(im, dtype=np.float64)
    for b in range(n):
        for yy in range(h):
            for xx in range(w):
                x = flow[b, yy, xx, 0] + xx + 1
                y = flow[b, yy, xx, 1] + yy + 1
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                x1, y1 = x0 + 1, y0 + 1
                x0c = np.clip(x0, 0, pw - 1)
                x1c = np.clip(x1, 0, pw - 1)
                y0c = np.clip(y0, 0, ph - 1)
                y1c = np.clip(y1, 0, ph - 1)
                dx = x1c - x
                dy = y1c - y
                ref[b, yy, xx] = (
                    dx * dy * padded[b, y0c, x0c]
                    + dx * (1 - dy) * padded[b, y1c, x0c]
                    + (1 - dx) * dy * padded[b, y0c, x1c]
                    + (1 - dx) * (1 - dy) * padded[b, y1c, x1c]
                )
    got = np.asarray(spatial_transform(jnp.asarray(im), jnp.asarray(flow)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_gen_line():
    k, b = gen_line([0, 10], [100, 60])
    assert np.isclose(k, 2.0) and np.isclose(b, -20.0)
    k, b = gen_line([5, 3], [9, 3])  # vertical line -> epsilon guard
    assert abs(k) > 1e8


@pytest.mark.parametrize(
    "k,b", [(0.7, 10.0), (-1.3, 120.0), (0.0, 64.0), (25.0, -40.0)]
)
def test_gen_flow_jnp_matches_numpy(k, b):
    h, w = 64, 48
    f_np, f2_np, m_np = gen_flow_np(h, w, k, b, line_width=6, fold_width=30, dis_k=0.05)
    f_j, f2_j, m_j = gen_flow(h, w, k, b, line_width=6.0, fold_width=30.0, dis_k=0.05)
    np.testing.assert_allclose(np.asarray(f_j), f_np, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(f2_j), f2_np, rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(m_j), m_np)


def test_gen_flow_structure():
    h = w = 96
    k, b, lw, fw, dk = 0.5, 20.0, 5, 20, 0.1
    flow, flow2, mask = gen_flow_np(h, w, k, b, line_width=lw, fold_width=fw, dis_k=dk)
    assert np.all(np.isfinite(flow)) and np.all(np.isfinite(flow2))
    # Mask zeros exactly the |distance| <= line_width strip
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    dis = (k * gx - gy + b) / np.sqrt(k**2 + 1)
    np.testing.assert_array_equal(mask, (np.abs(dis) > lw).astype(np.float32))
    # Inside the line strip the displacement magnitude equals |distance|
    # (mask_dis = 0 there, so the raw distance passes through).
    mag = np.linalg.norm(flow, axis=-1)
    strip = np.abs(dis) < lw
    np.testing.assert_allclose(mag[strip], np.abs(dis)[strip], rtol=1e-4)
    # flow and flow2 displace in opposite directions where both are active
    mid = (np.abs(dis) > lw) & (np.abs(dis) < fw)
    dots = (flow[..., 0] * flow2[..., 0] + flow[..., 1] * flow2[..., 1])[mid]
    assert np.all(dots <= 1e-6)
