"""Banded Pallas warp vs ops/warp.py::spatial_transform (interpret mode).

The kernel is exact to f32 rounding (<= ~2e-7 abs on unit-range images:
the bilinear mix associates differently from the corner-packed XLA
formulation) whenever its envelope predicate is True (row window fits
``win``; source columns within KC vregs), and ``warp_band_or_xla``
extends that to ARBITRARY flows via the XLA fallback branch (bit-exact
there — it IS spatial_transform). Reference semantics:
image_warp_torch.py:97-113.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from sstem_tpu.data.sim_sff import degrade_sff
from sstem_tpu.kernels.warp_band import warp_band, warp_band_or_xla
from sstem_tpu.ops import spatial_transform


def _fold_flows(rng, n, h, w):
    flows = []
    for _ in range(n):
        out = degrade_sff(
            np.asarray(rng.integers(0, 255, (h + 144, w + 144)), np.uint8),
            rng, det_size=max(h, w))
        flows.append(np.asarray(out["flow2"], np.float32)[:h, :w])
    return jnp.asarray(np.stack(flows))


CASES = {
    "fold_flow2": lambda rng, n, h, w: _fold_flows(rng, n, h, w),
    "uniform_pm3": lambda rng, n, h, w: jnp.asarray(
        rng.uniform(-3, 3, (n, h, w, 2)), jnp.float32),
    "uniform_pm40": lambda rng, n, h, w: jnp.asarray(
        rng.uniform(-40, 40, (n, h, w, 2)), jnp.float32),
    "integer_flow": lambda rng, n, h, w: jnp.asarray(
        rng.integers(-5, 6, (n, h, w, 2)).astype(np.float32)),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_warp_band_exact_inside_envelope(case):
    rng = np.random.default_rng(0)
    n, h, w = 2, 128, 192
    im = jnp.asarray(rng.random((n, h, w, 1)), jnp.float32)
    flow = CASES[case](rng, n, h, w)
    want = np.asarray(spatial_transform(im, flow))
    got, exact = warp_band(im, flow, win=160, interpret=True)
    assert bool(exact), case
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-6,
                               err_msg=case)


def test_far_oob_flow_trips_envelope_and_falls_back():
    rng = np.random.default_rng(1)
    n, h, w = 2, 64, 128
    im = jnp.asarray(rng.random((n, h, w, 1)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-2 * h, 2 * h, (n, h, w, 2)),
                       jnp.float32)
    _, exact = warp_band(im, flow, win=64, interpret=True)
    assert not bool(exact)
    got = warp_band_or_xla(im, flow, win=64, interpret=True)
    want = np.asarray(spatial_transform(im, flow))
    # the fallback branch IS spatial_transform, but XLA may fuse it
    # differently inside the lax.cond branch -> f32-rounding tolerance
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-6)


def test_vertical_fold_column_jump_stays_exact():
    """A fold line that displaces COLUMNS (dx-heavy flow) exercises the
    per-vreg mask composition across the KC reach."""
    rng = np.random.default_rng(2)
    n, h, w = 1, 64, 384
    im = jnp.asarray(rng.random((n, h, w, 1)), jnp.float32)
    dx = np.zeros((n, h, w), np.float32)
    dx[:, :, 190:] = -113.0  # constant shift, crosses vreg boundaries
    dx[:, :, :190] = 21.5
    flow = jnp.asarray(np.stack([dx, np.zeros_like(dx)], axis=-1))
    want = np.asarray(spatial_transform(im, flow))
    got, exact = warp_band(im, flow, win=32, interpret=True)
    assert bool(exact)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-6)


def test_row_window_overflow_detected():
    """dy exceeding the static win must clear the exact flag (never a
    silently wrong result)."""
    rng = np.random.default_rng(3)
    n, h, w = 1, 128, 128
    im = jnp.asarray(rng.random((n, h, w, 1)), jnp.float32)
    dy = np.zeros((n, h, w), np.float32)
    dy[:, ::2] = 90.0  # alternate rows pull from 90 rows away
    flow = jnp.asarray(np.stack([np.zeros_like(dy), dy], axis=-1))
    _, exact = warp_band(im, flow, win=32, interpret=True)
    assert not bool(exact)
    got = warp_band_or_xla(im, flow, win=32, interpret=True)
    want = np.asarray(spatial_transform(im, flow))
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-6)
