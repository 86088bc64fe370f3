"""Device meshes and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(SURVEY §2.7). The TPU-native replacement: a ``jax.sharding.Mesh`` with a
'data' axis (batch parallelism; gradient psum over ICI inserted by the SPMD
partitioner) and an optional 'space' axis used by the tiled full-section
inference path (the spatial/context-parallel analog, SURVEY §5.7).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts (DCN between slices handled by XLA).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_space=1, devices=None):
    """Mesh over ('data', 'space'). Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    assert n_data * n_space <= len(devices), (
        f"need {n_data}x{n_space} devices, have {len(devices)}"
    )
    arr = np.asarray(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(arr, ("data", "space"))


def shard_batch(batch, mesh):
    """Put a host batch onto the mesh, sharded on the leading (batch) axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, sharding)


def replicate(tree, mesh):
    """Replicate a pytree (params, state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
