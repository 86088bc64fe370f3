"""GAN discriminator heads + replay buffer.

Parity with sff_scripts_interp/loss/loss_adversarial.py (defined but never
wired into a reference trainer — re-created here because they are part of the
reference's capability surface; our trainers expose them behind the same
optional adversarial config):
  * ``Discriminator``  (:38-60): 4x4 s2 blocks 64/128/256 + asymmetric
    zero-pad + 4x4 conv -> patch map
  * ``Discriminator2`` (:62-86): ngf blocks + 4x4 conv + global avg pool ->
    (N, 1) score
  * ``Discriminator3`` (:88-110): as 2 but returns the patch map
  * ``NLayerDiscriminator`` (:112-156): PatchGAN (pix2pix), BatchNorm default
  * ``PixelDiscriminator`` (:158-188): 1x1 PatchGAN
  * ``ReplayBuffer`` (:16-35): host-side image pool for D updates
"""

import random
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sstem_tpu.models.layers import leaky_relu_02


def _conv4(features, stride, name=None, use_bias=True):
    return nn.Conv(
        features, (4, 4), strides=(stride, stride),
        padding=[(1, 1), (1, 1)], use_bias=use_bias, name=name,
    )


class _InstanceNorm(nn.Module):
    """torch InstanceNorm2d default: affine=False, no running stats."""

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + 1e-5)


class Discriminator(nn.Module):
    """Patch discriminator with asymmetric final padding."""

    @nn.compact
    def __call__(self, x):
        for i, (feats, norm) in enumerate([(64, False), (128, True), (256, True)]):
            x = _conv4(feats, 2, name=f"block{i}_conv")(x)
            if norm:
                x = _InstanceNorm(name=f"block{i}_norm")(x)
            x = leaky_relu_02(x)
        # ZeroPad2d((1, 0, 1, 0)): (left, right, top, bottom)
        x = jnp.pad(x, [(0, 0), (1, 0), (1, 0), (0, 0)])
        return _conv4(1, 1, name="out")(x)


class Discriminator2(nn.Module):
    """Global-average-pooled scalar discriminator."""

    ngf: int = 32

    @nn.compact
    def __call__(self, x):
        for i, (feats, norm) in enumerate(
            [(self.ngf, False), (self.ngf * 2, True), (self.ngf * 4, True)]
        ):
            x = _conv4(feats, 2, name=f"block{i}_conv")(x)
            if norm:
                x = _InstanceNorm(name=f"block{i}_norm")(x)
            x = leaky_relu_02(x)
        x = _conv4(1, 1, name="out")(x)
        return jnp.mean(x, axis=(1, 2))  # (N, 1)


class Discriminator3(nn.Module):
    """As Discriminator2 but returns the patch map."""

    ngf: int = 32

    @nn.compact
    def __call__(self, x):
        for i, (feats, norm) in enumerate(
            [(self.ngf, False), (self.ngf * 2, True), (self.ngf * 4, True)]
        ):
            x = _conv4(feats, 2, name=f"block{i}_conv")(x)
            if norm:
                x = _InstanceNorm(name=f"block{i}_norm")(x)
            x = leaky_relu_02(x)
        return _conv4(1, 1, name="out")(x)


class NLayerDiscriminator(nn.Module):
    """pix2pix PatchGAN (BatchNorm variant, n_layers=3)."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = leaky_relu_02(_conv4(self.ndf, 2, name="conv0")(x))
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            x = _conv4(self.ndf * nf, 2, name=f"conv{n}", use_bias=False)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{n}",
            )(x)
            x = leaky_relu_02(x)
        nf = min(2**self.n_layers, 8)
        x = _conv4(self.ndf * nf, 1, name=f"conv{self.n_layers}", use_bias=False)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=f"bn{self.n_layers}",
        )(x)
        x = leaky_relu_02(x)
        return _conv4(1, 1, name="out")(x)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN."""

    ndf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = leaky_relu_02(nn.Conv(self.ndf, (1, 1), name="conv0")(x))
        x = nn.Conv(self.ndf * 2, (1, 1), use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1"
        )(x)
        x = leaky_relu_02(x)
        return nn.Conv(1, (1, 1), use_bias=False, name="out")(x)


class ReplayBuffer:
    """Host-side image pool (max 50) for discriminator updates."""

    def __init__(self, max_size: int = 50, seed: int = 0):
        assert max_size > 0
        self.max_size = max_size
        self.data = []
        self._rng = random.Random(seed)

    def push_and_pop(self, batch: np.ndarray) -> np.ndarray:
        out = []
        for element in np.asarray(batch):
            element = element[None]
            if len(self.data) < self.max_size:
                self.data.append(element)
                out.append(element)
            elif self._rng.uniform(0, 1) > 0.5:
                i = self._rng.randint(0, self.max_size - 1)
                out.append(self.data[i].copy())
                self.data[i] = element
            else:
                out.append(element)
        return np.concatenate(out, axis=0)
