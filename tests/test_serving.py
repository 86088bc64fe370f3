"""Packed serving forwards vs the flax modules (eval mode, CPU interpret)."""

import numpy as np

import jax
import jax.numpy as jnp

from sstem_tpu.models import FusionNet, UNetSFF
from sstem_tpu.models.serving import fusionnet_serve, unet_sff_serve

RNG = np.random.default_rng(11)


def _init(model, shape):
    key = jax.random.PRNGKey(0)
    x = jnp.zeros(shape, jnp.float32)
    variables = jax.jit(
        lambda k, t: model.init(k, t, train=True))(key, x)
    # run a couple of train steps' worth of stat updates so BN stats are
    # not the all-zero/one init (a real fold test)
    for i in range(2):
        xb = jnp.asarray(RNG.random(shape), jnp.float32)
        _, mut = model.apply(variables, xb, train=True,
                             mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
    return variables


def test_fusionnet_serve_matches_flax():
    model = FusionNet(output_nc=2, ngf=32)
    shape = (1, 32, 64, 6)
    variables = _init(model, shape)
    x = jnp.asarray(RNG.random(shape), jnp.float32)
    want = model.apply(variables, x, train=False)
    got = fusionnet_serve(variables, x, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.1)


def test_unet_sff_serve_matches_flax():
    model = UNetSFF(out_channel=1)
    shape = (1, 32, 64, 6)
    variables = _init(model, shape)
    x = jnp.asarray(RNG.random(shape), jnp.float32)
    want = model.apply(variables, x, train=False)
    got = unet_sff_serve(variables, x, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.1)


def test_ifnet_serve_matches_flax():
    from sstem_tpu.models import IFNet
    from sstem_tpu.models.serving import ifnet_serve

    k = 11  # small kernel keeps the CPU interpret run fast
    model = IFNet(kernel_size=k, n_frames=1)
    shape = (1, 64, 64, 6)
    key = jax.random.PRNGKey(2)
    variables = jax.jit(model.init)(key, jnp.zeros(shape, jnp.float32))
    g = RNG.random((2, 1, 64, 64, 1))
    x = jnp.asarray(np.concatenate(
        [np.repeat(g[0], 3, -1), np.repeat(g[1], 3, -1)], -1), jnp.float32)
    # compare against the flax model at the same serving dtype (bf16):
    # random orthogonal weights amplify f32-vs-bf16 drift beyond what
    # trained weights see
    import sstem_tpu.config as cfg

    cfg.set_compute_dtype("bfloat16")
    try:
        want = model.apply(variables, x)
        got = ifnet_serve(variables, x, kernel_size=k, interpret=True)
    finally:
        cfg.set_compute_dtype(None)
    assert got.shape == want.shape
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    # random-init activations reach |y| ~ 10 and small outputs arise from
    # cancellation, so pointwise relative error is ill-posed; bf16 noise
    # compounds to a few percent of the output SCALE over the ~25-conv
    # depth. Structural bugs (mis-wired skip, wrong module, dropped tap)
    # produce order-one normalized error.
    nrmse = float(np.sqrt(np.mean((got - want) ** 2)) / (want.std() + 1e-6))
    assert nrmse < 0.05, f"NRMSE {nrmse:.4f}"


def test_ifnet_serve_two_frame():
    """2-frame (SP VFI) ifnet_serve vs the flax IFNet at serving dtype.

    Covers bench_sp.py's serving path: 2-channel gray-pair input, 8 head
    tails (head{1,2}{v,h}_f{1,2}), two sepconv frames out
    (sp_scripts_train/networks.py:105-129 semantics)."""
    from sstem_tpu.models import IFNet
    from sstem_tpu.models.serving import ifnet_serve

    k = 11
    model = IFNet(kernel_size=k, n_frames=2)
    key = jax.random.PRNGKey(9)
    variables = jax.jit(model.init)(key, jnp.zeros((1, 64, 64, 6),
                                                   jnp.float32))
    g = RNG.random((2, 1, 64, 64, 1)).astype(np.float32)
    x6 = jnp.asarray(np.concatenate(
        [np.repeat(g[0], 3, -1), np.repeat(g[1], 3, -1)], -1))
    x2 = jnp.asarray(np.concatenate([g[0], g[1]], -1))
    import sstem_tpu.config as cfg

    cfg.set_compute_dtype("bfloat16")
    try:
        want = model.apply(variables, x6)
    finally:
        cfg.set_compute_dtype(None)
    got = ifnet_serve(variables, x2, kernel_size=k, n_frames=2,
                      interpret=True)
    assert got.shape == want.shape == (1, 64, 64, 2)
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    nrmse = float(np.sqrt(np.mean((got - want) ** 2)) / (want.std() + 1e-6))
    assert nrmse < 0.05, f"NRMSE {nrmse:.4f}"


def test_ifnet_serve_gray_pair_input():
    """2-channel gray-pair input == 6-channel replicated input.

    The first conv is pair-folded (fold_gray_pair_conv) — exact in f32;
    serving then rounds the summed weights to bf16 once, so the two
    inputs differ by one extra bf16 weight rounding that random-init
    depth amplifies to ~2% of output scale (trained weights see less).
    The gate that matters: the 2ch path stays inside the same flax-bf16
    envelope as the 6ch path (test_ifnet_serve_matches_flax's 0.05)."""
    from sstem_tpu.models import IFNet
    from sstem_tpu.models.serving import ifnet_serve

    k = 11
    model = IFNet(kernel_size=k, n_frames=1)
    key = jax.random.PRNGKey(5)
    variables = jax.jit(model.init)(key, jnp.zeros((1, 64, 64, 6),
                                                   jnp.float32))
    g = RNG.random((2, 1, 64, 64, 1)).astype(np.float32)
    x6 = jnp.asarray(np.concatenate(
        [np.repeat(g[0], 3, -1), np.repeat(g[1], 3, -1)], -1))
    x2 = jnp.asarray(np.concatenate([g[0], g[1]], -1))
    import sstem_tpu.config as cfg

    cfg.set_compute_dtype("bfloat16")
    try:
        oracle = model.apply(variables, x6)
    finally:
        cfg.set_compute_dtype(None)
    want = ifnet_serve(variables, x6, kernel_size=k, interpret=True)
    got = ifnet_serve(variables, x2, kernel_size=k, interpret=True)
    assert got.shape == want.shape
    oracle = np.asarray(oracle, np.float32)
    want = np.asarray(want, np.float32)
    got = np.asarray(got, np.float32)

    def nrmse(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)) / (b.std() + 1e-6))

    assert nrmse(got, want) < 0.03, f"serve2 vs serve6 {nrmse(got, want):.4f}"
    assert nrmse(got, oracle) < 0.05, f"serve2 vs flax {nrmse(got, oracle):.4f}"


def test_unet_sp_serve_matches_flax():
    from sstem_tpu.models import UNetSP
    from sstem_tpu.models.serving import unet_sp_serve

    model = UNetSP(1)
    shape = (1, 32, 64, 1)
    variables = _init(model, shape)
    x = jnp.asarray(RNG.random(shape), jnp.float32)
    want = model.apply(variables, x, train=False)
    got = unet_sp_serve(variables, x, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.1)


def test_fusionnet_sp_serve_matches_flax():
    from sstem_tpu.models import FusionNetSP
    from sstem_tpu.models.serving import fusionnet_sp_serve

    model = FusionNetSP(1)
    shape = (1, 32, 64, 1)
    key = jax.random.PRNGKey(4)
    x0 = jnp.zeros(shape, jnp.float32)
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, train=True))(key, x0, x0)
    for i in range(2):
        a = jnp.asarray(RNG.random(shape), jnp.float32)
        b = jnp.asarray(RNG.random(shape), jnp.float32)
        _, mut = model.apply(variables, a, b, train=True,
                             mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
    a = jnp.asarray(RNG.random(shape), jnp.float32)
    b = jnp.asarray(RNG.random(shape), jnp.float32)
    want = model.apply(variables, a, b, train=False)
    got = fusionnet_sp_serve(variables, a, b, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.1)


def test_gray_pair_fold_exact():
    """2-channel [gray, other] input == 6-channel replicated input."""
    from sstem_tpu.models.serving import unet_sff_serve

    model = UNetSFF(out_channel=1)
    shape = (1, 32, 64, 6)
    variables = _init(model, shape)
    g = RNG.random((1, 32, 64, 1))
    o = RNG.random((1, 32, 64, 1))
    x6 = jnp.asarray(np.concatenate(
        [np.repeat(g, 3, -1), np.repeat(o, 3, -1)], -1), jnp.float32)
    x2 = jnp.asarray(np.concatenate([g, o], -1), jnp.float32)
    y6 = unet_sff_serve(variables, x6, interpret=True)
    y2 = unet_sff_serve(variables, x2, interpret=True)
    np.testing.assert_allclose(np.asarray(y2, np.float32),
                               np.asarray(y6, np.float32),
                               atol=0.02, rtol=0.05)


def test_ifnet_serve_batched_head_tail(monkeypatch):
    """SSTEM_BATCHED_HEAD_TAIL=1 (one grouped conv3 for all head tails)
    matches the per-head path: same math, different op batching."""
    from sstem_tpu.models import IFNet
    from sstem_tpu.models.serving import ifnet_serve

    k = 11
    model = IFNet(kernel_size=k, n_frames=1)
    key = jax.random.PRNGKey(3)
    variables = jax.jit(model.init)(key, jnp.zeros((1, 64, 64, 6),
                                                   jnp.float32))
    g = RNG.random((2, 1, 64, 64, 1)).astype(np.float32)
    x2 = jnp.asarray(np.concatenate([g[0], g[1]], -1))
    monkeypatch.delenv("SSTEM_BATCHED_HEAD_TAIL", raising=False)
    want = np.asarray(ifnet_serve(variables, x2, kernel_size=k,
                                  interpret=True), np.float32)
    monkeypatch.setenv("SSTEM_BATCHED_HEAD_TAIL", "1")
    got = np.asarray(ifnet_serve(variables, x2, kernel_size=k,
                                 interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0.02)


def test_ifnet_serve_fused_head_tail(monkeypatch):
    """SSTEM_FUSED_HEAD_TAIL=1 (Pallas phase-decomposed upsample+conv3,
    kernels/head_tail.py) matches the per-head XLA path. Needs
    (w//2) % 128 == 0, hence the 256-wide input."""
    from sstem_tpu.models import IFNet
    from sstem_tpu.models.serving import ifnet_serve

    k = 11
    model = IFNet(kernel_size=k, n_frames=1)
    key = jax.random.PRNGKey(4)
    variables = jax.jit(model.init)(key, jnp.zeros((1, 64, 256, 6),
                                                   jnp.float32))
    g = RNG.random((2, 1, 64, 256, 1)).astype(np.float32)
    x2 = jnp.asarray(np.concatenate([g[0], g[1]], -1))
    monkeypatch.delenv("SSTEM_FUSED_HEAD_TAIL", raising=False)
    want = np.asarray(ifnet_serve(variables, x2, kernel_size=k,
                                  interpret=True), np.float32)
    monkeypatch.setenv("SSTEM_FUSED_HEAD_TAIL", "1")
    got = np.asarray(ifnet_serve(variables, x2, kernel_size=k,
                                 interpret=True), np.float32)
    # The fused tail is NOT bit-identical to the XLA tail (bf16 staging,
    # different matmul blocking), and the 2*K^2-tap sepconv amplifies
    # independent rounding; per-head maps agree with the f32 oracle to
    # <0.7% (test_head_tail.py). Structural bugs (wrong phase, shifted
    # tap, mis-blocked weights) produce order-one NRMSE here.
    nrmse = float(np.sqrt(np.mean((got - want) ** 2)) / (want.std() + 1e-6))
    assert nrmse < 0.02, f"NRMSE {nrmse:.4f}"
