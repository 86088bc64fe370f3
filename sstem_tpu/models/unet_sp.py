"""SP U-Nets — milesial-style 4-level denoising U-Net + additive FusionNet.

Parity targets (sp_scripts_train/networks.py):
  * ``UNet`` (:243-273): DoubleConv/Down/Up/OutConv; bilinear
    align_corners upsampling with pad-to-match (:220-232), concat [x2, x1];
    channel plan 64/128/256/512/512 (factor-2 reduction on the deepest level
    and each Up when bilinear).
  * ``FusionNet`` (:275-306): identical topology, ``forward(x1, x2)`` *adds*
    the two inputs first (:295).
"""

import jax.numpy as jnp
from flax import linen as nn

from sstem_tpu.models.layers import (
    BatchNorm2dTorch,
    Conv2dTorch,
    max_pool_2x2,
)
from sstem_tpu.ops import upsample_bilinear_align_corners


class DoubleConv(nn.Module):
    features: int
    mid: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.mid or self.features
        x = Conv2dTorch(mid, name="conv0")(x)
        x = nn.relu(BatchNorm2dTorch(name="bn0")(x, train))
        x = Conv2dTorch(self.features, name="conv1")(x)
        x = nn.relu(BatchNorm2dTorch(name="bn1")(x, train))
        return x


class _Down(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        return DoubleConv(self.features, name="conv")(max_pool_2x2(x), train)


class _Up(nn.Module):
    """Bilinear upsample + pad-to-match + concat [skip, upsampled] + DoubleConv."""

    features: int
    mid: int

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        x1 = upsample_bilinear_align_corners(x1, 2)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(
                x1,
                [(0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)],
            )
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.features, mid=self.mid, name="conv")(x, train)


class _UNetBackbone(nn.Module):
    n_classes: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x1 = DoubleConv(64, name="inc")(x, train)
        x2 = _Down(128, name="down1")(x1, train)
        x3 = _Down(256, name="down2")(x2, train)
        x4 = _Down(512, name="down3")(x3, train)
        x5 = _Down(512, name="down4")(x4, train)  # 1024 // 2 (bilinear)
        x = _Up(256, 512, name="up1")(x5, x4, train)
        x = _Up(128, 256, name="up2")(x, x3, train)
        x = _Up(64, 128, name="up3")(x, x2, train)
        x = _Up(64, 64, name="up4")(x, x1, train)
        return Conv2dTorch(self.n_classes, kernel_size=1, padding=0, name="outc")(x)


class UNetSP(nn.Module):
    """SP correction/denoising U-Net (reference ``UNet(n_channels, n_classes)``)."""

    n_classes: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        return _UNetBackbone(self.n_classes, name="backbone")(x, train)


class FusionNetSP(nn.Module):
    """SP fusion net: same U-Net, inputs added first (networks.py:295)."""

    n_classes: int = 1

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        return _UNetBackbone(self.n_classes, name="backbone")(x1 + x2, train)
