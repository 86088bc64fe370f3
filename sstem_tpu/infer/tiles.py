"""Full-section inference: single-shot and halo-padded tiled execution.

The reference feeds whole 1250^2 sections through the conv nets in one shot
on GPU (inference scripts; SP test code crops to stride multiples —
test_fusion.py:78-87, and to %4 in test_interp.py:66-68, which is too small
for a 32x-downsampling net, a latent reference bug; we always pad to the
true stride). TPU-native execution offers:

  * ``infer_full`` — pad to the model stride, one XLA launch. A 1250^2
    section fits HBM comfortably; this is the parity path.
  * ``infer_tiled`` — halo-padded tiles batched through the model: bounds
    activation memory for arbitrarily large sections, keeps shapes static
    (one compile per tile size), and parallelizes across the mesh 'data'
    axis when given one — the spatial/context-parallel analog (SURVEY §5.7).
    Edge-replicate padding matches the interior border statistics.
"""

import numpy as np

import jax
import jax.numpy as jnp


def pad_to_multiple(x, multiple, mode="edge"):
    """Pad trailing spatial dims of (N, H, W, C) up to a stride multiple."""
    n, h, w, c = x.shape
    hp = -(-h // multiple) * multiple
    wp = -(-w // multiple) * multiple
    if hp == h and wp == w:
        return x, (h, w)
    x = jnp.pad(x, [(0, 0), (0, hp - h), (0, wp - w), (0, 0)], mode=mode)
    return x, (h, w)


def infer_full(apply_fn, image, multiple=32):
    """Run apply_fn on a full (N, H, W, C) image, padded to the stride."""
    padded, (h, w) = pad_to_multiple(image, multiple)
    out = apply_fn(padded)
    return out[:, :h, :w, :]


def tile_image(image, tile=512, halo=64, mode="constant"):
    """(H, W, C) -> (T, tile+2*halo, tile+2*halo, C) halo-padded tiles.

    Zero padding by default so border tiles see exactly what the zero-padded
    convolutions of a full-image pass would see (bit-exact tiled == full for
    models whose receptive field fits the halo). Returns (tiles, grid) where
    grid = (ny, nx, h, w)."""
    h, w, c = image.shape
    ny = -(-h // tile)
    nx = -(-w // tile)
    padded = jnp.pad(
        image,
        [(halo, ny * tile - h + halo), (halo, nx * tile - w + halo), (0, 0)],
        mode=mode,
    )
    tiles = []
    for iy in range(ny):
        for ix in range(nx):
            tiles.append(
                jax.lax.dynamic_slice(
                    padded, (iy * tile, ix * tile, 0),
                    (tile + 2 * halo, tile + 2 * halo, c),
                )
            )
    return jnp.stack(tiles), (ny, nx, h, w)


def untile(tiles_out, grid, halo=64):
    """Crop tile centers and reassemble to (H, W, C_out)."""
    ny, nx, h, w = grid
    t = tiles_out.shape[1] - 2 * halo
    c = tiles_out.shape[-1]
    centers = tiles_out[:, halo:halo + t, halo:halo + t, :]
    rows = [
        jnp.concatenate([centers[iy * nx + ix] for ix in range(nx)], axis=1)
        for iy in range(ny)
    ]
    full = jnp.concatenate(rows, axis=0)
    return full[:h, :w, :]


def infer_tiled(apply_fn, image, tile=512, halo=64, batch=4, mesh=None,
                mode="constant"):
    """Tiled inference of one (H, W, C) section.

    apply_fn: (N, tile+2h, tile+2h, C) -> (N, tile+2h, tile+2h, C_out),
    compiled once for the fixed tile shape. With ``mesh``, tile batches are
    sharded over the 'data' axis (spatial parallelism across chips).
    """
    tiles, grid = tile_image(image, tile, halo, mode)
    n = tiles.shape[0]
    outs = []
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        batch = max(batch, n_dev)
        sharding = NamedSharding(mesh, P("data"))
    for s in range(0, n, batch):
        chunk = tiles[s:s + batch]
        pad_n = batch - chunk.shape[0]
        if pad_n:
            chunk = jnp.concatenate(
                [chunk, jnp.repeat(chunk[-1:], pad_n, axis=0)], axis=0
            )
        if mesh is not None:
            chunk = jax.device_put(chunk, sharding)
        out = apply_fn(chunk)
        outs.append(out[: batch - pad_n] if pad_n else out)
    return untile(jnp.concatenate(outs, axis=0), grid, halo)
