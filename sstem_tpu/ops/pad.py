"""Padding ops with PyTorch-parity semantics.

Reference behavior: ``nn.ReplicationPad2d(25)`` applied to each source frame
before the separable convolution (sff_scripts_interp/model/model_interp.py:46,90-91).
"""

import jax.numpy as jnp


def replication_pad_2d(x, pad):
    """Replicate-pad the two spatial dims of an NHWC (or HWC/HW) array.

    Equivalent to torch ``nn.ReplicationPad2d(pad)`` (edge replication).

    Args:
      x: array with spatial dims at positions (-3, -2) for NHWC/HWC, or the
         last two dims for HW.
      pad: int or (top, bottom, left, right) padding amounts.
    """
    if isinstance(pad, int):
        pt = pb = pl_ = pr = pad
    else:
        pt, pb, pl_, pr = pad
    if x.ndim == 2:
        cfg = [(pt, pb), (pl_, pr)]
    else:
        cfg = [(0, 0)] * (x.ndim - 3) + [(pt, pb), (pl_, pr), (0, 0)]
    return jnp.pad(x, cfg, mode="edge")
