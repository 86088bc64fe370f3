"""Torch-parity neural net building blocks (flax.linen, NHWC).

The reference models rely on specific PyTorch layer semantics; each has an
exact JAX equivalent here:
  * Conv2d(k=3, s=1, p=1) -> nn.Conv with explicit ((1,1),(1,1)) padding.
  * ConvTranspose2d(k=3, s=2, p=1, output_padding=1) -> input-dilated conv
    with spatially flipped kernel and ((1,2),(1,2)) padding (exactly doubles
    the spatial size, as in the reference decoders).
  * BatchNorm2d -> nn.BatchNorm(momentum=0.9, eps=1e-5) (torch momentum 0.1).
  * MaxPool2d/AvgPool2d(2,2) -> nn.max_pool/avg_pool.
  * weight inits: torch-default kaiming-uniform(a=sqrt(5)) + bias bound,
    orthogonal(gain=sqrt(2)) (IFNet, model_interp.py:145-149), and
    normal(0, 0.02) (FusionNet, model_fusionnet.py:107-113).
"""

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from sstem_tpu.config import compute_dtype, matmul_precision


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default: kaiming_uniform(a=sqrt(5)).

    flax kernel shape is (kh, kw, in, out); fan_in = kh*kw*in.
    """
    fan_in = shape[0] * shape[1] * shape[2]
    gain = math.sqrt(2.0 / (1 + 5.0))  # a = sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def orthogonal_relu_gain_init():
    """torch init.orthogonal_(w, gain=calculate_gain('relu')) == sqrt(2)."""
    return nn.initializers.orthogonal(scale=math.sqrt(2.0), column_axis=-1)


def normal_002_init():
    """FusionNet conv init: normal(0, 0.02)."""
    return nn.initializers.normal(stddev=0.02)


def bn_scale_normal_init(key, shape, dtype=jnp.float32):
    """FusionNet BN weight init: normal(1.0, 0.02)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

class _RawConv(nn.Module):
    """Param-compatible stand-in for ``nn.Conv`` with free dimension numbers.

    Declares the same ``kernel``/``bias`` params (same shapes, same init,
    same scope path when named "Conv_0") but calls
    ``lax.conv_general_dilated`` with caller-chosen input/output layouts —
    used by the packed model paths to keep planar (NCHW) tensors planar
    through a conv without relayout round-trips.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dimension_numbers: tuple = ("NHWC", "HWIO", "NHWC")

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[1] if self.dimension_numbers[0] == "NCHW" else x.shape[-1]
        w = self.param("kernel", self.kernel_init, (k, k, in_ch, self.features))
        cdt = compute_dtype()
        if cdt is not None:
            x = x.astype(cdt)
            w = w.astype(cdt)
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=self.dimension_numbers,
            precision=matmul_precision(),
        )
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            if cdt is not None:
                b = b.astype(cdt)
            if self.dimension_numbers[2] == "NCHW":
                y = y + b[None, :, None, None]
            else:
                y = y + b
        return y


class Conv2dTorch(nn.Module):
    """Conv2d with torch-style explicit padding and default torch init.

    ``data_format`` selects the activation layout of the lax call while the
    parameter tree stays identical to the default nn.Conv layout
    ("Conv_0/kernel" (kh, kw, in, out), "Conv_0/bias"):
      * "NHWC"     — default (nn.Conv).
      * "NCHW"     — planar in, planar out.
      * "NCHW_OUT" — NHWC in, planar out (conv output layout assignment
        absorbs the transpose; used to emit sepconv tap maps).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[1] if self.data_format == "NCHW" else x.shape[-1]
        fan_in = k * k * cin
        if self.data_format != "NHWC":
            dims = {
                "NCHW": ("NCHW", "HWIO", "NCHW"),
                "NCHW_OUT": ("NHWC", "HWIO", "NCHW"),
            }[self.data_format]
            return _RawConv(
                self.features, k, self.stride, self.padding, self.use_bias,
                self.kernel_init, torch_conv_bias_init(fan_in),
                dimension_numbers=dims, name="Conv_0",
            )(x)
        return nn.Conv(
            self.features,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=torch_conv_bias_init(fan_in),
            precision=matmul_precision(),
            dtype=compute_dtype(),
        )(x)


class ConvTranspose2dTorch(nn.Module):
    """ConvTranspose2d(kernel=3, stride=2, padding=1, output_padding=1).

    Weight is stored flax-style (kh, kw, out, in) and applied as an
    input-dilated convolution with the kernel spatially flipped — the exact
    adjoint of the strided conv, matching torch semantics (out = 2 * in).
    """

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    kernel_init: Callable = None

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        in_ch = x.shape[-1]
        # torch fan_in for ConvTranspose2d weight (in, out, kh, kw) is
        # out * kh * kw / groups ... torch uses weight.size(1)*k*k = out*k*k
        fan_in = self.features * k * k
        kinit = self.kernel_init
        if kinit is None:
            def kinit(key, shape, dtype=jnp.float32):
                gain = math.sqrt(2.0 / 6.0)
                bound = gain * math.sqrt(3.0 / fan_in)
                return jax.random.uniform(key, shape, dtype, -bound, bound)
        w = self.param("kernel", kinit, (k, k, self.features, in_ch))
        b = self.param("bias", torch_conv_bias_init(fan_in), (self.features,))
        cdt = compute_dtype()
        if cdt is not None:
            x = x.astype(cdt)
            w = w.astype(cdt)
            b = b.astype(cdt)
        lo = k - 1 - p
        hi = k - 1 - p + op
        y = lax.conv_general_dilated(
            x,
            jnp.flip(w, axis=(0, 1)),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWOI", "NHWC"),
            precision=matmul_precision(),
        )
        return y + b


class _TorchBatchNorm(nn.Module):
    """Exact torch BatchNorm2d semantics (NHWC).

    Differences from ``nn.BatchNorm`` that matter for training-dynamics
    parity (tests/test_training_parity.py):
      * the running variance is updated with the UNBIASED batch variance
        (torch multiplies by n/(n-1), n = N*H*W) while normalization uses
        the biased variance — flax uses the biased variance for both, which
        drifts the running stats by up to n/(n-1) (14% at the 2x2-spatial
        bridge of a tiny FusionNet).
    Batch statistics accumulate in f32; with a bf16 compute dtype the
    normalized output is emitted bf16 so the activation chain stays
    half-width between convs. Variable layout matches nn.BatchNorm
    ('scale'/'bias' params, 'mean'/'var' batch_stats) so checkpoints and
    the torch importers are unaffected.
    """

    momentum: float = 0.9      # flax convention: new = m*old + (1-m)*batch
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        feat = x.shape[-1]
        scale = self.param("scale", self.scale_init, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros_init(), None, (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", nn.initializers.ones_init(), None, (feat,)
        )

        # stats accumulate in >= f32 (f64 stays f64 for the x64 parity
        # harness; bf16 activations promote to f32)
        acc_dt = jnp.promote_types(x.dtype, jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(acc_dt)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = np.prod([x.shape[a] for a in axes])
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (m * ra_mean.value + (1 - m) * mean).astype(
                    ra_mean.value.dtype)
                ra_var.value = (m * ra_var.value + (1 - m) * unbiased).astype(
                    ra_var.value.dtype)

        cdt = compute_dtype()
        out_dtype = cdt if cdt is not None else x.dtype
        inv = lax.rsqrt(var.astype(acc_dt) + self.epsilon) * scale.astype(acc_dt)
        y = (x.astype(acc_dt) - mean.astype(acc_dt)) * inv + bias.astype(acc_dt)
        return y.astype(out_dtype)


class BatchNorm2dTorch(nn.Module):
    """BatchNorm2d parity: momentum 0.1 (torch) == flax momentum 0.9, eps
    1e-5, unbiased running variance (see _TorchBatchNorm)."""

    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, train: bool):
        # the inner module is named BatchNorm_0 to keep the variable tree
        # identical to the previous nn.BatchNorm-based implementation
        return _TorchBatchNorm(
            scale_init=self.scale_init, name="BatchNorm_0"
        )(x, use_running_average=not train)


def max_pool_2x2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def avg_pool_2x2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def leaky_relu_02(x):
    return nn.leaky_relu(x, negative_slope=0.2)
