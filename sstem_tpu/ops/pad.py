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


def negative_pad_2d(x, pad: int):
    """Crop ``pad`` pixels from each spatial border of an NHWC array.

    Parity with the reference SP trainers' ``F.pad(x, (-PAD,)*4)`` loss crop
    (sp_scripts_train/main_interp.py:137-140, main_correction.py:144-149,
    main_fusion.py:228-233). ``pad == 0`` is the identity, matching torch.
    """
    if pad == 0:
        return x
    if pad < 0:
        raise ValueError("negative_pad_2d takes the crop amount (>= 0)")
    if 2 * pad >= x.shape[1] or 2 * pad >= x.shape[2]:
        raise ValueError(
            f"crop pad {pad} consumes the whole {x.shape[1]}x{x.shape[2]} "
            "patch (loss would be NaN); lower TRAIN PAD or raise patch_size")
    return x[:, pad:-pad, pad:-pad, :]
