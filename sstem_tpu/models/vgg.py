"""VGG19 feature extractor for the perceptual loss.

Parity with the reference (sff_scripts_interp/loss/loss_vgg.py:37-158): the
torchvision VGG19 ``features`` trunk split at every ReLU; the perceptual loss
consumes the relu{1,2,3,4,5}_1 taps only, so this module computes through
conv5_1 and returns those five (the deeper taps of the reference forward are
dead weight for the loss and are not re-created).

No input normalization is applied — the reference feeds raw [0,1] gray images
replicated to 3 channels (main_ms.py:195-198).

Weights: ``load_torch_vgg19_features(path)`` converts a torch
``vgg19-dcbb9e9d.pth`` state dict (features.N.weight OIHW -> HWIO). Without a
weights file the extractor runs with random init (useful for smoke tests; not
for training parity).
"""

from typing import Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sstem_tpu.config import matmul_precision

# (name, out_channels, pool_before) through conv5_1, torchvision cfg 'E'
_LAYERS = [
    ("conv1_1", 64, False),
    ("conv1_2", 64, False),
    ("conv2_1", 128, True),
    ("conv2_2", 128, False),
    ("conv3_1", 256, True),
    ("conv3_2", 256, False),
    ("conv3_3", 256, False),
    ("conv3_4", 256, False),
    ("conv4_1", 512, True),
    ("conv4_2", 512, False),
    ("conv4_3", 512, False),
    ("conv4_4", 512, False),
    ("conv5_1", 512, True),
]

# torchvision vgg19.features indices of the conv layers above
_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]

_TAPS = {"conv1_1": "relu1_1", "conv2_1": "relu2_1", "conv3_1": "relu3_1",
         "conv4_1": "relu4_1", "conv5_1": "relu5_1"}


class VGG19Features(nn.Module):
    """Returns {'relu1_1', 'relu2_1', 'relu3_1', 'relu4_1', 'relu5_1'}."""

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, feats, pool in _LAYERS:
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(
                feats, (3, 3), padding=[(1, 1), (1, 1)], name=name,
                precision=matmul_precision(),
            )(x)
            x = nn.relu(x)
            if name in _TAPS:
                out[_TAPS[name]] = x
        return out


def load_torch_vgg19_features(path: str):
    """Convert a torch vgg19 state dict into VGG19Features params."""
    import torch

    sd = torch.load(path, map_location="cpu")
    params = {}
    for (name, _, _), idx in zip(_LAYERS, _TORCH_IDX):
        w = sd[f"features.{idx}.weight"].numpy()  # OIHW
        b = sd[f"features.{idx}.bias"].numpy()
        params[name] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
            "bias": jnp.asarray(b),
        }
    return {"params": params}
