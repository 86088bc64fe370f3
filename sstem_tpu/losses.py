"""Training losses — parity with the reference loss zoo (all NHWC, jit-safe).

Sources re-specified here:
  * SSIMLoss (1 - SSIM, 11x11 sigma=1.5 window, per-channel grouped conv,
    SAME padding, C on [0,1] range) — sff_scripts_interp/loss/loss_ssim.py:74-135
  * MS_SSIM (5 levels, per-level window min(h,w,11) & scaled sigma,
    weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333], product form)
    — sff_scripts_unfolding/loss/loss_ssim.py:18-73
  * EPE / sparse_max_pool / multiscaleEPE / realEPE
    — sff_scripts_unfolding/loss/multiscaleloss.py:5-60
  * GANLoss (lsgan / vanilla / wgangp), G_LOSS, AD_LOSS
    — sff_scripts_interp/loss/loss_adversarial.py:190-283
  * Perceptual (VGG19 relu{1..5}_1 taps, L1 or L2; inputs are gray images
    replicated to 3 channels, no ImageNet normalization)
    — sff_scripts_interp/loss/loss_vgg.py:6-34,160-179 + main_ms.py:193-200
"""

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

from sstem_tpu.config import matmul_precision


# ---------------------------------------------------------------------------
# Pixel losses
# ---------------------------------------------------------------------------

def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


# ---------------------------------------------------------------------------
# SSIM family
# ---------------------------------------------------------------------------

@lru_cache(maxsize=16)
def _gauss_window(window_size: int, sigma: float):
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2)
    )
    g = g / g.sum()
    w2 = np.outer(g, g).astype(np.float32)
    return w2


def _grouped_blur(x, window_size: int, sigma: float):
    """Per-channel SAME conv with the Gaussian window (torch groups=C)."""
    c = x.shape[-1]
    w = jnp.asarray(_gauss_window(window_size, sigma))[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, c))  # HWIO with I=1 per group
    p = window_size // 2
    return lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=matmul_precision(),
    )


def _ssim_parts(img1, img2, window_size: int, sigma: float, max_val: float):
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu1 = _grouped_blur(img1, window_size, sigma)
    mu2 = _grouped_blur(img2, window_size, sigma)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _grouped_blur(img1 * img1, window_size, sigma) - mu1_sq
    s2 = _grouped_blur(img2 * img2, window_size, sigma) - mu2_sq
    s12 = _grouped_blur(img1 * img2, window_size, sigma) - mu1_mu2
    v1 = 2.0 * s12 + c2
    v2 = s1 + s2 + c2
    ssim_map = ((2 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    cs_map = v1 / v2
    return ssim_map, cs_map


def ssim(img1, img2, window_size: int = 11, max_val: float = 1.0):
    """SSIM over NHWC images; the training-loss dialect (SAME padding)."""
    ssim_map, _ = _ssim_parts(img1, img2, window_size, 1.5, max_val)
    return jnp.mean(ssim_map)


def ssim_loss(pred, target, window_size: int = 11):
    """Reference ``SSIMLoss`` == 1 - SSIM on [0,1] images."""
    return 1.0 - ssim(pred, target, window_size, max_val=1.0)


def ms_ssim(img1, img2, levels: int = 5, max_val: float = 255.0):
    """Reference ``MS_SSIM``: product of contrast terms + final SSIM term."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    msssim = []
    mcs = []
    for _ in range(levels):
        h, w = img1.shape[1], img1.shape[2]
        ws = min(h, w, 11)
        sigma = 1.5 * ws / 11
        ssim_map, cs_map = _ssim_parts(img1, img2, ws, sigma, max_val)
        msssim.append(jnp.mean(ssim_map))
        mcs.append(jnp.mean(cs_map))
        img1 = lax.reduce_window(
            img1, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        img2 = lax.reduce_window(
            img2, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
    msssim = jnp.stack(msssim)
    mcs = jnp.stack(mcs)
    return jnp.prod(mcs[: levels - 1] ** weights[: levels - 1]) * (
        msssim[levels - 1] ** weights[levels - 1]
    )


# ---------------------------------------------------------------------------
# Flow end-point error
# ---------------------------------------------------------------------------

def epe(pred_flow, target_flow, sparse: bool = False, mean: bool = True):
    """End-point error over NHWC flow (C=2).

    sparse: pixels where both target components are exactly 0 are invalid
    (multiscaleloss.py:8-12); implemented as a masked mean (jit-safe).
    """
    epe_map = jnp.linalg.norm(target_flow - pred_flow, ord=2, axis=-1)
    n = pred_flow.shape[0]
    if sparse:
        valid = ~((target_flow[..., 0] == 0) & (target_flow[..., 1] == 0))
        if mean:
            return jnp.sum(epe_map * valid) / jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(epe_map * valid) / n
    if mean:
        return jnp.mean(epe_map)
    return jnp.sum(epe_map) / n


def sparse_max_pool(x, size):
    """Downsample treating exact-0 as invalid: max-pool positives plus
    min-pool negatives (multiscaleloss.py:19-31). Requires divisible sizes."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = size
    assert h % oh == 0 and w % ow == 0, "adaptive pooling needs divisible sizes"
    kh, kw = h // oh, w // ow
    pos = jnp.where(x > 0, x, 0.0)
    neg = jnp.where(x < 0, -x, 0.0)

    def mp(z):
        return lax.reduce_window(
            z, -jnp.inf, lax.max, (1, kh, kw, 1), (1, kh, kw, 1), "VALID"
        )

    return mp(pos) - mp(neg)


def _area_downsample(x, size):
    h, w = x.shape[1], x.shape[2]
    oh, ow = size
    assert h % oh == 0 and w % ow == 0, "area interp needs divisible sizes"
    kh, kw = h // oh, w // ow
    return lax.reduce_window(
        x, 0.0, lax.add, (1, kh, kw, 1), (1, kh, kw, 1), "VALID"
    ) / float(kh * kw)


def multiscale_epe(network_outputs, target_flow, weights=None, sparse=False):
    """Reference ``multiscaleEPE`` (weights from the FlowNet article)."""
    if not isinstance(network_outputs, (tuple, list)):
        network_outputs = [network_outputs]
    if weights is None:
        weights = [0.005, 0.01, 0.02, 0.08, 0.32]
    assert len(weights) == len(network_outputs)
    loss = 0.0
    for out, wgt in zip(network_outputs, weights):
        size = (out.shape[1], out.shape[2])
        tgt = sparse_max_pool(target_flow, size) if sparse else _area_downsample(
            target_flow, size
        )
        loss = loss + wgt * epe(out, tgt, sparse, mean=False)
    return loss


def real_epe(pred_flow, target_flow, sparse=False):
    """Upsample prediction to target size (bilinear, align_corners=False)."""
    import jax.image

    n, h, w, c = target_flow.shape
    up = jax.image.resize(pred_flow, (n, h, w, c), method="linear")
    return epe(up, target_flow, sparse, mean=True)


# ---------------------------------------------------------------------------
# GAN objectives
# ---------------------------------------------------------------------------

def gan_loss(prediction, target_is_real: bool, mode: str = "lsgan"):
    """Reference ``GANLoss``: lsgan (MSE to label), vanilla (BCE-with-logits),
    wgangp (signed mean)."""
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((prediction - target) ** 2)
    if mode == "vanilla":
        target = jnp.ones_like(prediction) if target_is_real else jnp.zeros_like(prediction)
        # BCEWithLogits: max(x,0) - x*z + log(1 + exp(-|x|))
        x = prediction
        return jnp.mean(
            jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
        )
    if mode == "wgangp":
        return -jnp.mean(prediction) if target_is_real else jnp.mean(prediction)
    raise NotImplementedError(f"gan mode {mode} not implemented")


def g_loss(pred_fake, mode: str = "lsgan"):
    """Generator adversarial term (loss_adversarial.py:260-268)."""
    return gan_loss(pred_fake, True, mode)


def d_loss(pred_fake, pred_real, mode: str = "lsgan"):
    """Discriminator term, 0.5 * (real + fake) (loss_adversarial.py:271-283)."""
    return 0.5 * (gan_loss(pred_real, True, mode) + gan_loss(pred_fake, False, mode))


# ---------------------------------------------------------------------------
# Perceptual (VGG19) loss
# ---------------------------------------------------------------------------

def vgg_feature_loss(feats1, feats2, mode: int = 2, weights=(1.0,) * 5):
    """Reference ``vgg_loss``: (L1 if mode==1 else L2) over relu{1..5}_1 taps."""
    crit = l1_loss if mode == 1 else l2_loss
    taps = ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"]
    loss = 0.0
    for wgt, tap in zip(weights, taps):
        loss = loss + wgt * crit(feats1[tap], feats2[tap])
    return loss


def perceptual_loss(vgg_apply, pred, target, vgg_weight=1.0, com_weight=1.0,
                    combine: str = "L1", mode: int = 1):
    """Full perceptual objective as wired in main_ms.py:193-200:
    grayscale pred/target are replicated to 3 channels, passed through VGG19,
    and combined with a pixel loss."""
    crit = l1_loss if combine == "L1" else l2_loss
    loss_com = crit(pred, target)
    pred3 = jnp.concatenate([pred] * 3, axis=-1)
    target3 = jnp.concatenate([target] * 3, axis=-1)
    f1 = vgg_apply(pred3)
    f2 = vgg_apply(target3)
    return com_weight * loss_com + vgg_weight * vgg_feature_loss(f1, f2, mode)
