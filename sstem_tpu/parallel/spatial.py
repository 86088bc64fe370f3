"""Spatial sharding with halo exchange — the context-parallel analog.

Full ssTEM sections are sharded by rows across the mesh 'space' axis; each
device exchanges ``halo`` boundary rows with its neighbors over ICI
(jax.lax.ppermute inside shard_map) and runs the model on its slab.

Boundary semantics: the image is first zero-extended by ``halo`` rows (the
"canvas"), and the sharded result equals ``apply_fn(canvas)`` cropped back —
bit-exactly, for any model whose receptive-field margin fits the halo. (A
multi-layer conv net is *not* equivalent between a raw-image pass and a
zero-extended pass within the receptive field of the border — biases/ReLUs
light up the pad region — so the canvas pass is the well-defined target; the
host-side tiled path in sstem_tpu.infer.tiles implements the same
semantics.)
"""

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P


def spatial_apply(apply_fn, image, mesh, halo, axis="space",
                  batch_axis=None):
    """Apply a local model over a row-sharded image batch.

    Args:
      apply_fn: (N, h, W, C) -> (N, h, W, C_out), pure and shape-preserving
        in the spatial dims (SAME-padded convs, eval-mode norm).
      image: (N, H, W, C).
      mesh: Mesh containing ``axis``.
      halo: boundary rows exchanged with each neighbor (>= receptive-field
        margin for exactness).
      batch_axis: optional mesh axis name to additionally shard the batch
        dim over (dp x sp: sections over 'data', rows over 'space').

    Returns (N, H, W, C_out) == apply_fn(zero-extended canvas) cropped.
    """
    n = mesh.shape[axis]
    h = image.shape[1]
    hc = h + 2 * halo
    hp = -(-hc // n) * n
    canvas = jnp.pad(
        image, [(0, 0), (halo, halo + hp - hc), (0, 0), (0, 0)]
    )

    def local(xb):
        if halo == 0:
            return apply_fn(xb)
        top = xb[:, :halo]
        bot = xb[:, -halo:]
        up = [(i, i - 1) for i in range(1, n)]
        down = [(i, i + 1) for i in range(n - 1)]
        from_below = jax.lax.ppermute(top, axis, up)
        from_above = jax.lax.ppermute(bot, axis, down)
        padded = jnp.concatenate([from_above, xb, from_below], axis=1)
        out = apply_fn(padded)
        return out[:, halo:-halo]

    spec_in = P(batch_axis, axis, None, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                   out_specs=spec_in, check_rep=False)
    out = fn(canvas)
    return out[:, halo:halo + h]
