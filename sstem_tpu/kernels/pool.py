"""Pixel-packed 2x2 pooling Pallas kernel.

Pooling between packed conv levels normally costs unpack -> reduce_window
-> repack (three full passes). On the packed layout the 2x2 window is a
pure lane selection: output pixel phase p takes input lanes (2p)C+c and
(2p+1)C+c of the SAME quad, and the row pair is a leading-dim slice — so
one kernel pass computes the pool AND emits the next level's packing
(C channels at P/2 pixels per block; quad count preserved; zero borders
maintained).

Lane moves are exact 0/1 selection matmuls (each output lane sums exactly
one input lane), so max pooling is exact: max of the four extracted
tensors. Average pooling sums the four extractions in f32 and scales by
0.25.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sstem_tpu.kernels.conv3x3 import _LANES


def _selection(c_in: int, phase: int):
    """(128, 128) 0/1 matrix: out lane p*2c+ci <- in lane (2p+phase)*c+ci.

    The output packing has 2*c_in channel slots per pixel (c_in real ones,
    the upper half zero) so the pooled tensor lands in the next level's
    C = 2*c_in packing directly.
    """
    p_in = _LANES // c_in
    p_out = p_in // 2
    c_slot = _LANES // p_out
    s = np.zeros((_LANES, _LANES), np.float32)
    for p in range(p_out):
        for ci in range(c_in):
            s[(2 * p + phase) * c_in + ci, p * c_slot + ci] = 1.0
    return s


def _kernel(wq: int, mode: str, pipelined: bool,
            x_hbm, s0_ref, s1_ref, out_ref, buf, sem):
    n = pl.program_id(0)
    t = pl.program_id(1)
    ty = out_ref.shape[1]
    wq2 = buf.shape[2]
    n_tiles = pl.num_programs(1)

    def dma_for(slot, tt):
        return pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(tt * 2 * ty, 2 * ty)], buf.at[slot],
            sem.at[slot])

    if pipelined:
        @pl.when(t == 0)
        def _first():
            dma_for(0, 0).start()

        @pl.when(t + 1 < n_tiles)
        def _prefetch():
            dma_for((t + 1) % 2, t + 1).start()

        dma_for(t % 2, t).wait()
        raw = buf[t % 2]
    else:
        d = dma_for(0, t)
        d.start()
        d.wait()
        raw = buf[0]

    win = raw.reshape(ty, 2, wq2, _LANES)
    m = ty * wq2

    def extract(rows, s_ref):
        lhs = rows.reshape(m, _LANES)
        return lax.dot_general(lhs, s_ref[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    e0 = extract(win[:, 0], s0_ref)
    e1 = extract(win[:, 0], s1_ref)
    o0 = extract(win[:, 1], s0_ref)
    o1 = extract(win[:, 1], s1_ref)
    if mode == "max":
        y = jnp.maximum(jnp.maximum(e0, e1), jnp.maximum(o0, o1))
    else:
        y = (e0 + e1 + o0 + o1) * 0.25
    y = y.reshape(ty, wq2, _LANES)
    quad = lax.broadcasted_iota(jnp.int32, (ty, wq2, _LANES), 1)
    y = jnp.where((quad == 0) | (quad > wq), 0.0, y)
    out_ref[0] = y.astype(out_ref.dtype)


def pool2x_packed(xq, c_in: int, mode="max", *, wq, interpret=False):
    """2x2 stride-2 pooling on the packed layout.

    Args:
      xq: (N, H, Wq2, 128) packed (P pixels x c_in channels), P >= 2.
      c_in: real channels per pixel.
      mode: 'max' or 'avg'.
      wq: real quad count.
    Returns (N, H/2, Wq2, 128) packed at P/2 pixels x 2*c_in channel slots
    (channels c_in..2c_in-1 of each pixel are zero).
    """
    n, h, wq2, lanes = xq.shape
    assert lanes == _LANES and h % 16 == 0
    assert _LANES // c_in >= 2, "pooling needs >= 2 pixels per block"
    s0 = jnp.asarray(_selection(c_in, 0), jnp.bfloat16)
    s1 = jnp.asarray(_selection(c_in, 1), jnp.bfloat16)

    def kern(x_hbm, s0r, s1r, out_ref, buf, sem):
        _kernel(wq, mode, not interpret, x_hbm, s0r, s1r, out_ref, buf, sem)

    ty = 8
    return pl.pallas_call(
        kern,
        grid=(n, h // (2 * ty)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((_LANES, _LANES), lambda i, t: (0, 0)),
            pl.BlockSpec((_LANES, _LANES), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ty, wq2, _LANES),
                               lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, wq2, _LANES), xq.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * ty, wq2, _LANES), xq.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xq, s0, s1)
