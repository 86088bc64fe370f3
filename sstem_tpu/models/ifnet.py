"""IFNet — kernel-prediction interpolation network (SFF 1-frame / SP 2-frame).

Capability parity with the reference encoder/decoder KPN:
  * SFF variant (sff_scripts_interp/model/model_interp.py:9-149): 6-ch input
    (two gray neighbor sections replicated x3), 5-level conv encoder 32..512
    with AvgPool, decoder with align_corners bilinear upsampling and
    *additive* skips, 4 kernel heads each emitting K=51 per-pixel taps,
    ReplicationPad(K//2) on each source frame, sepconv apply, channel-mean.
  * SP variant (sp_scripts_train/networks.py:9-170): same backbone, two sets
    of 4 kernel heads producing two interpolated frames (sections 2 and 3),
    output concatenated to 2 channels. (The reference declares 16 heads but
    uses only 8 in forward — networks.py:34-66 vs :105-114; the unused 8 are
    vestigial and not re-created here.)

The reference's vestigial super-resolution branch (model_interp.py:39-44,
forward commented at :100-106) is likewise not re-created; its parameters are
ignored by the torch-checkpoint importer.

Layout is NHWC (TPU-native); init is orthogonal(gain=sqrt(2)) per the
reference (_weight_init, model_interp.py:145-149).
"""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from sstem_tpu.kernels import sepconv, sepconv_planar
from sstem_tpu.models.layers import (
    Conv2dTorch,
    avg_pool_2x2,
    orthogonal_relu_gain_init,
)
from sstem_tpu.config import compute_dtype, matmul_precision
from sstem_tpu.ops import (
    replication_pad_2d,
    upsample2x_planar_mxu,
    upsample_bilinear_align_corners,
)


class _ConvModule(nn.Module):
    """conv(in,in)+relu, conv(in,in)+relu, conv(in,out)+relu."""

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        init = orthogonal_relu_gain_init()
        x = nn.relu(Conv2dTorch(cin, kernel_init=init, name="conv0")(x))
        x = nn.relu(Conv2dTorch(cin, kernel_init=init, name="conv1")(x))
        x = nn.relu(Conv2dTorch(self.features, kernel_init=init, name="conv2")(x))
        return x


class _UpsampleModule(nn.Module):
    """upsample(x2, align_corners) + conv(in,out) + relu."""

    features: int

    @nn.compact
    def __call__(self, x):
        init = orthogonal_relu_gain_init()
        x = upsample_bilinear_align_corners(x, 2)
        x = nn.relu(Conv2dTorch(self.features, kernel_init=init, name="conv")(x))
        return x


class _KernelHead(nn.Module):
    """conv(64,64)+relu x2, conv(64,K)+relu, upsample, conv(K,K).

    ``packed=True`` computes the identical math but returns the tap map in
    planar (N, K, H, W) layout for direct consumption by ``sepconv_planar``
    — the transposes surrounding conv3 fold into XLA's conv layout
    assignment, so the full-resolution NHWC map (the hottest tensor in the
    model at K=51) is never materialized channels-minor.
    """

    taps: int
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        init = orthogonal_relu_gain_init()
        x = nn.relu(Conv2dTorch(cin, kernel_init=init, name="conv0")(x))
        x = nn.relu(Conv2dTorch(cin, kernel_init=init, name="conv1")(x))
        x = nn.relu(Conv2dTorch(self.taps, kernel_init=init, name="conv2")(x))
        if self.packed:
            xp = jnp.transpose(x, (0, 3, 1, 2))
            xp = upsample2x_planar_mxu(xp, precision=matmul_precision())
            return Conv2dTorch(self.taps, kernel_init=init,
                               data_format="NCHW", name="conv3")(xp)
        x = upsample_bilinear_align_corners(x, 2)
        x = Conv2dTorch(self.taps, kernel_init=init, name="conv3")(x)
        return x


class IFNet(nn.Module):
    """Kernel-prediction interpolation net.

    Attributes:
      kernel_size: per-pixel separable filter taps (reference: 51).
      n_frames: 1 (SFF — one interpolated section) or 2 (SP — sections 2 & 3).
      assume_gray: the reference always feeds grayscale sections replicated
        x3 (data_provider.py:132-141, inference.py:70-75), making the three
        sepconv output channels identical before the channel mean. With this
        flag (default) the local convolutions run on one channel — exactly
        the same result at a third of the sepconv cost. Set False to
        reproduce the reference computation for arbitrary 6-channel inputs.
    """

    kernel_size: int = 51
    n_frames: int = 1
    assume_gray: bool = True
    packed: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 6) — frames i1 = x[..., :3], i2 = x[..., 3:6].

        Returns (N, H, W, n_frames).
        """
        i1 = x[..., 0:3]
        i2 = x[..., 3:6]

        # ---- contraction (AvgPool between conv modules) ----
        x = _ConvModule(32, name="conv32")(x)
        x = avg_pool_2x2(x)
        x64 = _ConvModule(64, name="conv64")(x)
        x128 = avg_pool_2x2(x64)
        x128 = _ConvModule(128, name="conv128")(x128)
        x256 = avg_pool_2x2(x128)
        x256 = _ConvModule(256, name="conv256")(x256)
        x512 = avg_pool_2x2(x256)
        x512 = _ConvModule(512, name="conv512")(x512)
        x = avg_pool_2x2(x512)
        x = _ConvModule(512, name="conv512x512")(x)

        # ---- expansion (additive skips) ----
        x = _UpsampleModule(512, name="upsamp512")(x)
        x = x + x512
        x = _ConvModule(256, name="upconv256")(x)
        x = _UpsampleModule(256, name="upsamp256")(x)
        x = x + x256
        x = _ConvModule(128, name="upconv128")(x)
        x = _UpsampleModule(128, name="upsamp128")(x)
        x = x + x128
        x = _ConvModule(64, name="upconv64")(x)
        x = _UpsampleModule(64, name="upsamp64")(x)
        x = x + x64

        # ---- kernel heads + local (separable) convolutions ----
        pad = self.kernel_size // 2
        if self.assume_gray:
            i1 = i1[..., 0:1]
            i2 = i2[..., 0:1]
        padded_i1 = replication_pad_2d(i1, pad)
        padded_i2 = replication_pad_2d(i2, pad)
        if self.packed:
            # planar images for the planar sepconv (free relayout at C<=3);
            # under a bf16 compute dtype the kernel window also travels bf16
            # (f32 accumulation happens in-kernel)
            cdt = compute_dtype()
            if cdt is not None:
                padded_i1 = padded_i1.astype(cdt)
                padded_i2 = padded_i2.astype(cdt)
            padded_i1 = jnp.transpose(padded_i1, (0, 3, 1, 2))
            padded_i2 = jnp.transpose(padded_i2, (0, 3, 1, 2))

        outs = []
        for f in range(self.n_frames):
            sfx = "" if self.n_frames == 1 else f"_f{f + 1}"
            k2h = _KernelHead(self.kernel_size, self.packed,
                              name=f"head2h{sfx}")(x)
            k2v = _KernelHead(self.kernel_size, self.packed,
                              name=f"head2v{sfx}")(x)
            k1h = _KernelHead(self.kernel_size, self.packed,
                              name=f"head1h{sfx}")(x)
            k1v = _KernelHead(self.kernel_size, self.packed,
                              name=f"head1v{sfx}")(x)
            if self.packed:
                y = sepconv_planar(padded_i2, k2v, k2h) + sepconv_planar(
                    padded_i1, k1v, k1h)
                y = jnp.transpose(y, (0, 2, 3, 1))
            else:
                y = sepconv(padded_i2, k2v, k2h) + sepconv(padded_i1, k1v, k1h)
            if self.assume_gray:
                outs.append(y)
            else:
                outs.append(jnp.mean(y, axis=-1, keepdims=True))
        return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
