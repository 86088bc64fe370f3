"""Fused upsample+conv3 head tail kernel vs the XLA serving oracle
(interpret mode on CPU); hardware gate lives in tools/tpu_checks.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from sstem_tpu.kernels.head_tail import (
    dephase_transpose,
    head_tail_fused,
    head_tail_oracle,
)

RNG = np.random.default_rng(11)


def _case(n, hi, wi, cin, k):
    x = RNG.standard_normal((n, hi, 64, wi)).astype(np.float32)
    x[:, :, cin:, :] = 0.0  # packed head convs emit zeros in the pad slots
    w3 = (RNG.standard_normal((3, 3, cin, k)) * 0.1).astype(np.float32)
    b3 = (RNG.standard_normal(k) * 0.1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(w3), jnp.asarray(b3)


@pytest.mark.parametrize(
    "n,hi,wi,cin,k",
    [
        (2, 16, 128, 51, 51),   # serving geometry, small
        (1, 12, 256, 51, 51),   # non-pow2 rows, 2 lane tiles
        (1, 16, 128, 13, 13),   # H2H geometry (K=13)
        (1, 8, 128, 64, 64),    # full-width channels
        (1, 32, 128, 51, 51),   # hi >= 32: last-block window must not
                                # snap to row 0 (OOB-halo lo clamp)
    ],
)
def test_fused_matches_oracle(n, hi, wi, cin, k):
    x, w3, b3 = _case(n, hi, wi, cin, k)
    m = head_tail_fused(x, w3, b3, interpret=True)
    assert m.shape == (n, 2 * hi, k, 2 * wi)
    got = np.asarray(dephase_transpose(m, wi), np.float32)
    want = np.asarray(
        head_tail_oracle(x, w3, b3, precision="highest"), np.float32)
    assert got.shape == want.shape
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    # bf16 staging + bf16 matmul inputs vs the f32 oracle
    assert err < 0.02, err


def test_edges_match_zero_pad_semantics():
    """Corner columns/rows exercise the roll-wrap masking and the OOB
    H-lerp halo rows; compare those slices exactly (within bf16 tol)."""
    x, w3, b3 = _case(1, 8, 128, 51, 51)
    got = np.asarray(
        dephase_transpose(head_tail_fused(x, w3, b3, interpret=True), 128),
        np.float32)
    want = np.asarray(
        head_tail_oracle(x, w3, b3, precision="highest"), np.float32)
    scale = np.abs(want).max()
    for sl in (np.s_[..., 0], np.s_[..., -1], np.s_[..., 0, :],
               np.s_[..., -1, :]):
        assert np.abs(got[sl] - want[sl]).max() / scale < 0.02


def test_bf16_input_accepted():
    x, w3, b3 = _case(1, 8, 128, 51, 51)
    m = head_tail_fused(x.astype(jnp.bfloat16), w3, b3, interpret=True)
    assert m.dtype == jnp.bfloat16
