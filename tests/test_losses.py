"""Loss parity tests vs torch-cpu oracles."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sstem_tpu import losses

RNG = np.random.default_rng(11)


def _torch_gauss_window(ws, sigma, channel):
    g = torch.tensor(
        [math.exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)]
    )
    g = (g / g.sum()).unsqueeze(1)
    w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
    return w2.expand(channel, 1, ws, ws).contiguous()


def _torch_ssim(img1, img2, ws=11, sigma=1.5, max_val=1.0):
    c = img1.shape[1]
    win = _torch_gauss_window(ws, sigma, c)
    p = ws // 2
    mu1 = F.conv2d(img1, win, padding=p, groups=c)
    mu2 = F.conv2d(img2, win, padding=p, groups=c)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, win, padding=p, groups=c) - mu1_sq
    s2 = F.conv2d(img2 * img2, win, padding=p, groups=c) - mu2_sq
    s12 = F.conv2d(img1 * img2, win, padding=p, groups=c) - mu12
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean().item()


@pytest.mark.parity
def test_ssim_loss_matches_torch():
    a = RNG.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + RNG.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    ref = 1.0 - _torch_ssim(ta, tb)
    got = float(losses.ssim_loss(jnp.asarray(a), jnp.asarray(b)))
    assert np.isclose(got, ref, atol=1e-5)


@pytest.mark.parity
def test_ms_ssim_runs_and_bounds():
    a = RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    b = np.clip(a + RNG.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    v_same = float(losses.ms_ssim(jnp.asarray(a), jnp.asarray(a), max_val=1.0))
    v_diff = float(losses.ms_ssim(jnp.asarray(a), jnp.asarray(b), max_val=1.0))
    assert v_same > 0.999
    assert v_diff < v_same


def test_epe_matches_torch():
    p = RNG.standard_normal((2, 16, 16, 2)).astype(np.float32)
    t = RNG.standard_normal((2, 16, 16, 2)).astype(np.float32)
    tp = torch.from_numpy(p).permute(0, 3, 1, 2)
    tt = torch.from_numpy(t).permute(0, 3, 1, 2)
    ref = torch.norm(tt - tp, 2, 1).mean().item()
    got = float(losses.epe(jnp.asarray(p), jnp.asarray(t)))
    assert np.isclose(got, ref, atol=1e-5)
    # mean=False: sum / batch
    ref_sum = (torch.norm(tt - tp, 2, 1).sum() / 2).item()
    got_sum = float(losses.epe(jnp.asarray(p), jnp.asarray(t), mean=False))
    assert np.isclose(got_sum, ref_sum, rtol=1e-5)


def test_epe_sparse_masks_zero_flow():
    p = RNG.standard_normal((1, 8, 8, 2)).astype(np.float32)
    t = RNG.standard_normal((1, 8, 8, 2)).astype(np.float32)
    t[0, :4] = 0.0  # invalid region
    full = np.linalg.norm(t - p, axis=-1)
    valid = ~((t[..., 0] == 0) & (t[..., 1] == 0))
    ref = full[valid].mean()
    got = float(losses.epe(jnp.asarray(p), jnp.asarray(t), sparse=True))
    assert np.isclose(got, ref, atol=1e-5)


def test_multiscale_epe():
    t = RNG.standard_normal((1, 32, 32, 2)).astype(np.float32)
    outs = [
        jnp.asarray(RNG.standard_normal((1, 32 // 2**i, 32 // 2**i, 2)), jnp.float32)
        for i in range(5)
    ]
    v = float(losses.multiscale_epe(outs[::-1], jnp.asarray(t)))
    assert v > 0 and np.isfinite(v)


def test_real_epe_upsamples():
    p = jnp.asarray(RNG.standard_normal((1, 8, 8, 2)), jnp.float32)
    t = jnp.asarray(RNG.standard_normal((1, 32, 32, 2)), jnp.float32)
    v = float(losses.real_epe(p, t))
    assert v > 0 and np.isfinite(v)


def test_gan_losses_match_torch():
    pred = RNG.standard_normal((2, 8, 8, 1)).astype(np.float32)
    tp = torch.from_numpy(pred)
    # lsgan
    ref = F.mse_loss(tp, torch.ones_like(tp)).item()
    got = float(losses.gan_loss(jnp.asarray(pred), True, "lsgan"))
    assert np.isclose(got, ref, atol=1e-6)
    # vanilla (BCE with logits)
    ref = F.binary_cross_entropy_with_logits(tp, torch.zeros_like(tp)).item()
    got = float(losses.gan_loss(jnp.asarray(pred), False, "vanilla"))
    assert np.isclose(got, ref, atol=1e-6)
    # wgangp
    assert np.isclose(
        float(losses.gan_loss(jnp.asarray(pred), True, "wgangp")), -pred.mean(),
        atol=1e-6,
    )
    # composite heads
    d = float(losses.d_loss(jnp.asarray(pred), jnp.asarray(pred)))
    assert np.isfinite(d)


def test_discriminator_shapes():
    from sstem_tpu.models.discriminators import (
        Discriminator, Discriminator2, Discriminator3,
        NLayerDiscriminator, PixelDiscriminator, ReplayBuffer,
    )

    x = jnp.asarray(RNG.standard_normal((1, 32, 32, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)

    m = Discriminator()
    y = m.apply(m.init(key, x), x)
    assert y.shape == (1, 4, 4, 1)

    m2 = Discriminator2()
    y2 = m2.apply(m2.init(key, x), x)
    assert y2.shape == (1, 1)

    m3 = Discriminator3()
    y3 = m3.apply(m3.init(key, x), x)
    assert y3.shape[0] == 1 and y3.shape[-1] == 1

    m4 = NLayerDiscriminator()
    v4 = m4.init(key, x, train=False)
    y4 = m4.apply(v4, x, train=False)
    assert y4.shape[-1] == 1

    m5 = PixelDiscriminator()
    v5 = m5.init(key, x, train=False)
    y5 = m5.apply(v5, x, train=False)
    assert y5.shape == (1, 32, 32, 1)

    buf = ReplayBuffer(max_size=4)
    batch = RNG.standard_normal((2, 4, 4, 1)).astype(np.float32)
    out = buf.push_and_pop(batch)
    assert out.shape == batch.shape


def test_vgg_features_shapes():
    from sstem_tpu.models.vgg import VGG19Features

    m = VGG19Features()
    x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    feats = jax.jit(m.apply)(params, x)
    assert feats["relu1_1"].shape == (1, 32, 32, 64)
    assert feats["relu2_1"].shape == (1, 16, 16, 128)
    assert feats["relu5_1"].shape == (1, 2, 2, 512)
    v = float(losses.vgg_feature_loss(feats, feats, mode=1))
    assert v == 0.0
