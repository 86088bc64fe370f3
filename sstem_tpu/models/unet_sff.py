"""SFF fusion U-Net — 3-level U-Net with concat skips.

Parity target: sff_scripts_fusion/model/model_unet.py:6-105. Structure:
  * contracting blocks (conv+BN+ReLU x2) at 32/64/128, MaxPool between
  * bottleneck: conv(128->256)+BN+ReLU, conv(256->128)+BN+ReLU,
    ConvTranspose(128->128, k3 s2 p1 op1)+BN+ReLU
  * decoder: concat(upsampled, bypass) then expansive blocks
    (conv+BN+ReLU x2 + ConvTranspose+BN+ReLU)
  * final block conv(64->32)+BN+ReLU, conv(32->out)+BN+**ReLU** — the output
    activation really is ReLU in the reference (model_unet.py:48)
  * in 6ch (warped-SFF ++ interp), out 1ch; torch-default init
"""

import jax.numpy as jnp
from flax import linen as nn

from sstem_tpu.models.layers import (
    BatchNorm2dTorch,
    Conv2dTorch,
    ConvTranspose2dTorch,
    max_pool_2x2,
)


class _ContractBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv2dTorch(self.features, name="conv0")(x)
        x = nn.relu(BatchNorm2dTorch(name="bn0")(x, train))
        x = Conv2dTorch(self.features, name="conv1")(x)
        x = nn.relu(BatchNorm2dTorch(name="bn1")(x, train))
        return x


class _ExpandBlock(nn.Module):
    mid: int
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv2dTorch(self.mid, name="conv0")(x)
        x = nn.relu(BatchNorm2dTorch(name="bn0")(x, train))
        x = Conv2dTorch(self.mid, name="conv1")(x)
        x = nn.relu(BatchNorm2dTorch(name="bn1")(x, train))
        x = ConvTranspose2dTorch(self.features, name="deconv")(x)
        x = nn.relu(BatchNorm2dTorch(name="bn2")(x, train))
        return x


class UNetSFF(nn.Module):
    """3-level fusion U-Net (reference class name ``UNet``)."""

    out_channel: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        e1 = _ContractBlock(32, name="conv_encode1")(x, train)
        p1 = max_pool_2x2(e1)
        e2 = _ContractBlock(64, name="conv_encode2")(p1, train)
        p2 = max_pool_2x2(e2)
        e3 = _ContractBlock(128, name="conv_encode3")(p2, train)
        p3 = max_pool_2x2(e3)

        # bottleneck
        b = Conv2dTorch(256, name="bottleneck_conv0")(p3)
        b = nn.relu(BatchNorm2dTorch(name="bottleneck_bn0")(b, train))
        b = Conv2dTorch(128, name="bottleneck_conv1")(b)
        b = nn.relu(BatchNorm2dTorch(name="bottleneck_bn1")(b, train))
        b = ConvTranspose2dTorch(128, name="bottleneck_deconv")(b)
        b = nn.relu(BatchNorm2dTorch(name="bottleneck_bn2")(b, train))

        # decoder: concat(upsampled, bypass) — upsampled first (crop_and_concat)
        d3 = jnp.concatenate([b, e3], axis=-1)
        c2 = _ExpandBlock(128, 64, name="conv_decode3")(d3, train)
        d2 = jnp.concatenate([c2, e2], axis=-1)
        c1 = _ExpandBlock(64, 32, name="conv_decode2")(d2, train)
        d1 = jnp.concatenate([c1, e1], axis=-1)

        f = Conv2dTorch(32, name="final_conv0")(d1)
        f = nn.relu(BatchNorm2dTorch(name="final_bn0")(f, train))
        f = Conv2dTorch(self.out_channel, name="final_conv1")(f)
        f = nn.relu(BatchNorm2dTorch(name="final_bn1")(f, train))
        return f
