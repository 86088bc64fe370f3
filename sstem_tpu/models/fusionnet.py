"""FusionNet — residual U-Net used as the SFF flow/correction backbone.

Parity target: sff_scripts_unfolding/model/model_fusionnet.py:65-145 (an
identical cosmetic copy lives in sff_scripts_fusion/model/). Structure:
  * Conv_residual_conv blocks: conv_block -> conv_block_3 (residual add) ->
    conv_block (model_fusionnet.py:45-62)
  * 4x MaxPool down, ConvTranspose(k3, s2, p1, op1) up, skips *averaged*
    ``(deconv + down) / 2`` (:129-138)
  * BatchNorm everywhere; LeakyReLU(0.2) on the encoder/bridge, ReLU on the
    decoder; final 3x3 conv to ``output_nc`` (2-ch dense flow for unfolding)
  * init: conv weights normal(0, 0.02), BN weight normal(1.0, 0.02) (:107-113)
"""

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from sstem_tpu.models.layers import (
    BatchNorm2dTorch,
    Conv2dTorch,
    ConvTranspose2dTorch,
    bn_scale_normal_init,
    leaky_relu_02,
    max_pool_2x2,
    normal_002_init,
)


class _ConvBlock(nn.Module):
    features: int
    act: Callable

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv2dTorch(self.features, kernel_init=normal_002_init(), name="conv")(x)
        x = BatchNorm2dTorch(scale_init=bn_scale_normal_init, name="bn")(x, train)
        return self.act(x)


class _ConvBlock3(nn.Module):
    """conv_block x2 then conv+BN (no activation) — model_fusionnet.py:35-42."""

    features: int
    act: Callable

    @nn.compact
    def __call__(self, x, train: bool):
        x = _ConvBlock(self.features, self.act, name="block0")(x, train)
        x = _ConvBlock(self.features, self.act, name="block1")(x, train)
        x = Conv2dTorch(self.features, kernel_init=normal_002_init(), name="conv")(x)
        x = BatchNorm2dTorch(scale_init=bn_scale_normal_init, name="bn")(x, train)
        return x


class ConvResidualConv(nn.Module):
    features: int
    act: Callable

    @nn.compact
    def __call__(self, x, train: bool):
        c1 = _ConvBlock(self.features, self.act, name="conv_1")(x, train)
        c2 = _ConvBlock3(self.features, self.act, name="conv_2")(c1, train)
        res = c1 + c2
        return _ConvBlock(self.features, self.act, name="conv_3")(res, train)


class _DeconvBlock(nn.Module):
    features: int
    act: Callable

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvTranspose2dTorch(
            self.features, kernel_init=normal_002_init(), name="deconv"
        )(x)
        x = BatchNorm2dTorch(scale_init=bn_scale_normal_init, name="bn")(x, train)
        return self.act(x)


class FusionNet(nn.Module):
    """Residual U-Net; in 6ch (SFF image ++ interp image), out 2-ch flow."""

    output_nc: int = 2
    ngf: int = 32

    @nn.compact
    def __call__(self, x, train: bool = True):
        ngf = self.ngf
        enc_act = leaky_relu_02
        dec_act = nn.relu

        down_1 = ConvResidualConv(ngf, enc_act, name="down_1")(x, train)
        pool_1 = max_pool_2x2(down_1)
        down_2 = ConvResidualConv(ngf * 2, enc_act, name="down_2")(pool_1, train)
        pool_2 = max_pool_2x2(down_2)
        down_3 = ConvResidualConv(ngf * 4, enc_act, name="down_3")(pool_2, train)
        pool_3 = max_pool_2x2(down_3)
        down_4 = ConvResidualConv(ngf * 8, enc_act, name="down_4")(pool_3, train)
        pool_4 = max_pool_2x2(down_4)

        bridge = ConvResidualConv(ngf * 16, enc_act, name="bridge")(pool_4, train)

        deconv_1 = _DeconvBlock(ngf * 8, dec_act, name="deconv_1")(bridge, train)
        up_1 = ConvResidualConv(ngf * 8, dec_act, name="up_1")(
            (deconv_1 + down_4) / 2, train
        )
        deconv_2 = _DeconvBlock(ngf * 4, dec_act, name="deconv_2")(up_1, train)
        up_2 = ConvResidualConv(ngf * 4, dec_act, name="up_2")(
            (deconv_2 + down_3) / 2, train
        )
        deconv_3 = _DeconvBlock(ngf * 2, dec_act, name="deconv_3")(up_2, train)
        up_3 = ConvResidualConv(ngf * 2, dec_act, name="up_3")(
            (deconv_3 + down_2) / 2, train
        )
        deconv_4 = _DeconvBlock(ngf, dec_act, name="deconv_4")(up_3, train)
        up_4 = ConvResidualConv(ngf, dec_act, name="up_4")(
            (deconv_4 + down_1) / 2, train
        )

        return Conv2dTorch(
            self.output_nc, kernel_init=normal_002_init(), name="out"
        )(up_4)
