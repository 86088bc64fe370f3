"""Model construction/shape/grad tests + ConvTranspose torch parity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sstem_tpu.models import IFNet, FusionNet, UNetSFF, UNetSP, FusionNetSP
from sstem_tpu.models.layers import ConvTranspose2dTorch

RNG = np.random.default_rng(3)


@pytest.fixture(autouse=True)
def _fast_precision(request):
    """Shape/grad tests don't need MXU-parity precision; keep compiles fast.

    The torch-parity test opts back into HIGHEST via the `parity` marker.
    """
    import sstem_tpu.config as cfg

    if "parity" in request.keywords:
        yield
        return
    cfg.set_matmul_precision("default")
    try:
        yield
    finally:
        cfg.set_matmul_precision("highest")


@pytest.mark.parity
def test_conv_transpose_matches_torch():
    """ConvTranspose2d(k3, s2, p1, op1) — the reference decoder upsampler."""
    x = RNG.standard_normal((2, 5, 7, 4)).astype(np.float32)
    m = ConvTranspose2dTorch(features=6)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    assert got.shape == (2, 10, 14, 6)

    tm = torch.nn.ConvTranspose2d(4, 6, 3, stride=2, padding=1, output_padding=1)
    # flax kernel (kh, kw, out, in) -> torch weight (in, out, kh, kw)
    w = np.asarray(params["params"]["kernel"])
    tm.weight.data = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())
    tm.bias.data = torch.from_numpy(np.asarray(params["params"]["bias"]).copy())
    ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_frames", [1, 2])
def test_ifnet_shapes(n_frames):
    model = IFNet(kernel_size=5, n_frames=n_frames)
    x = jnp.asarray(RNG.standard_normal((1, 32, 32, 6)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 32, 32, n_frames)
    assert np.all(np.isfinite(np.asarray(y)))


def test_ifnet_grad_flows():
    model = IFNet(kernel_size=5, n_frames=1)
    x = jnp.asarray(RNG.standard_normal((1, 32, 32, 6)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean(model.apply(p, x) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    norms = [float(jnp.abs(l).max()) for l in leaves]
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


def test_fusionnet_shapes():
    model = FusionNet(output_nc=2)
    x = jnp.asarray(RNG.standard_normal((2, 32, 32, 6)), jnp.float32)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(jax.random.PRNGKey(0), x)
    y, mutated = jax.jit(
        lambda v, xx: model.apply(v, xx, train=True, mutable=["batch_stats"])
    )(variables, x)
    assert y.shape == (2, 32, 32, 2)
    assert "batch_stats" in mutated
    # eval mode uses running stats
    y_eval = model.apply(variables, x, train=False)
    assert y_eval.shape == (2, 32, 32, 2)


def test_unet_sff_shapes():
    model = UNetSFF(out_channel=1)
    x = jnp.asarray(RNG.standard_normal((1, 32, 32, 6)), jnp.float32)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(jax.random.PRNGKey(0), x)
    y, _ = jax.jit(
        lambda v, xx: model.apply(v, xx, train=True, mutable=["batch_stats"])
    )(variables, x)
    assert y.shape == (1, 32, 32, 1)
    assert float(jnp.min(y)) >= 0.0  # final block ends in ReLU (model_unet.py:48)


def test_unet_sp_shapes():
    model = UNetSP(n_classes=1)
    x = jnp.asarray(RNG.standard_normal((1, 32, 32, 1)), jnp.float32)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(jax.random.PRNGKey(0), x)
    y, _ = jax.jit(
        lambda v, xx: model.apply(v, xx, train=True, mutable=["batch_stats"])
    )(variables, x)
    assert y.shape == (1, 32, 32, 1)


def test_fusionnet_sp_adds_inputs():
    model = FusionNetSP(n_classes=1)
    a = jnp.asarray(RNG.standard_normal((1, 32, 32, 1)), jnp.float32)
    b = jnp.asarray(RNG.standard_normal((1, 32, 32, 1)), jnp.float32)
    variables = jax.jit(lambda k, aa, bb: model.init(k, aa, bb, train=True))(jax.random.PRNGKey(0), a, b)
    f = jax.jit(
        lambda v, aa, bb: model.apply(v, aa, bb, train=True, mutable=["batch_stats"])
    )
    y1, _ = f(variables, a, b)
    y2, _ = f(variables, b, a)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)


def test_unet_sp_odd_sizes_pad_to_match():
    """Reference Up pads x1 to x2's size (networks.py:220-232)."""
    model = UNetSP(n_classes=1)
    x = jnp.asarray(RNG.standard_normal((1, 48, 48, 1)), jnp.float32)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(jax.random.PRNGKey(0), x)
    y, _ = jax.jit(
        lambda v, xx: model.apply(v, xx, train=True, mutable=["batch_stats"])
    )(variables, x)
    assert y.shape == (1, 48, 48, 1)


def test_ifnet_packed_matches_unpacked():
    """The packed (planar-map, TPU-optimized) path computes the same
    function as the reference-layout path, for both frame counts."""
    import sstem_tpu.config as cfg

    cfg.set_matmul_precision("highest")
    try:
        for n_frames in (1, 2):
            model = IFNet(kernel_size=5, n_frames=n_frames)
            packed = IFNet(kernel_size=5, n_frames=n_frames, packed=True)
            rng = np.random.default_rng(3)
            x = jnp.asarray(rng.random((1, 64, 32, 6)), jnp.float32)
            variables = model.init(jax.random.PRNGKey(0), x)
            a = model.apply(variables, x)
            b = packed.apply(variables, x)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
    finally:
        cfg.set_matmul_precision("highest")


def test_ifnet_packed_init_matches_unpacked_init():
    """packed=True declares the identical parameter tree (same names,
    shapes, and init values) — checkpoints are interchangeable."""
    model = IFNet(kernel_size=5, n_frames=1)
    packed = IFNet(kernel_size=5, n_frames=1, packed=True)
    x = jnp.zeros((1, 32, 32, 6), jnp.float32)
    va = model.init(jax.random.PRNGKey(7), x)
    vb = packed.init(jax.random.PRNGKey(7), x)
    flat_a = jax.tree_util.tree_leaves_with_path(va)
    flat_b = jax.tree_util.tree_leaves_with_path(vb)
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, la), (_, lb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
