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


_COMPUTE_DTYPE = None  # None -> float32 activations


def set_compute_dtype(name):
    """Activation dtype for conv layers: None/'float32' or 'bfloat16'.

    bf16 halves HBM activation traffic and runs single-pass on the MXU;
    params stay f32. BatchNorm statistics always compute in f32. Quality
    impact vs the f32 path is measured by tools/quality_check.py.
    """
    global _COMPUTE_DTYPE
    import jax.numpy as jnp

    _COMPUTE_DTYPE = {
        None: None, "float32": None, "bfloat16": jnp.bfloat16,
    }[name]


def compute_dtype():
    return _COMPUTE_DTYPE
