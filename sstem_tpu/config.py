"""Global numerical policy for the framework.

``matmul_precision`` controls the MXU pass count for convs/dots:
  * "highest" — full f32 accumulation (parity with the f32 PyTorch reference;
    the default, and what the quality gates are measured with)
  * "high"    — bf16x3 passes
  * "default" — single-pass bf16 inputs (fastest; use after validating the
    <=0.1 dB PSNR budget on the parity harness)
"""

from jax import lax

_PRECISION = lax.Precision.HIGHEST


def set_matmul_precision(name: str):
    global _PRECISION
    _PRECISION = {
        "highest": lax.Precision.HIGHEST,
        "high": lax.Precision.HIGH,
        "default": lax.Precision.DEFAULT,
    }[name]


def matmul_precision():
    return _PRECISION
