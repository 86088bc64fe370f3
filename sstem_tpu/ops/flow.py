"""Fold-line flow synthesis (the SFF degradation model's core math).

Re-implements the semantics of the reference flow synthesizer
(sff_scripts_unfolding/utils/flow_synthesis.py:8-87, superset of
simu_sff/flow_synthesis.py:20-76):

* a fold line ``y = k*x + b`` through the image,
* signed perpendicular distance field ``d`` to the line,
* piecewise-linear displacement profile
  ``d' = -dis_k * |d| + (fold_width - line_width) + dis_k * line_width``
  clamped at 0, applied outside the ``line_width`` strip (``flow``) or the
  ``fold_width`` strip with opposite sign (``flow2``, the ground-truth
  unfolding flow),
* decomposition along the line normal via ``atan(1/k)``,
* ``mask`` that zeroes the fold-line strip (``|d| <= line_width``).

Provided both as exact numpy (``gen_flow_np``: golden-testable host version)
and as a jit/vmap-friendly jnp version (``gen_flow``) whose scalar parameters
may be traced values, enabling fully on-device degradation synthesis.
"""

import math

import jax.numpy as jnp
import numpy as np

_MINA = 1e-9


def gen_line(p1, p2):
    """Line (slope, intercept) through two points given as (y, x) pairs.

    Matches the reference convention: ``k = (y2-y1)/(x2-x1)`` with an epsilon
    guard on a vertical denominator (flow_synthesis.py:8-14; points are stored
    [row, col] and the 'denominator' is the column difference).
    """
    denom = p2[1] - p1[1]
    if denom == 0:
        denom = _MINA
    k = (p2[0] - p1[0]) / denom
    b = p1[0] - k * p1[1]
    return k, b


def _flow_fields_np(height, width, k, b, line_width, fold_width, dis_k):
    gx = np.tile(np.arange(width)[None, :], [height, 1]).astype(np.float64)
    gy = np.tile(np.arange(height)[:, None], [1, width]).astype(np.float64)
    dis = (k * gx - gy + b) / math.sqrt(k**2 + 1)

    sign = np.zeros_like(dis)
    sign[dis > 0] = 1
    sign[dis < 0] = -1

    dis_abs = np.abs(dis)
    mask = (dis_abs > line_width).astype(np.float64)

    mask_dis = (dis_abs >= line_width).astype(np.float64)
    mask_dis2 = (dis_abs >= fold_width).astype(np.float64)

    dis_width = fold_width - line_width
    slope = -dis_k
    intercept = dis_width - slope * line_width
    prof = np.maximum(slope * dis_abs + intercept, 0.0)

    d1 = prof * mask_dis + dis_abs * (1 - mask_dis)
    d2 = prof * mask_dis2 + dis_abs * (1 - mask_dis2)

    dis1 = d1 * sign
    dis2 = d2 * (-sign)

    k_t = 1.0 / _MINA if k == 0 else 1.0 / k
    angle = math.atan(k_t)
    sin_p, cos_p = math.sin(angle), math.cos(angle)

    flow = np.zeros((height, width, 2), dtype=np.float32)
    flow2 = np.zeros((height, width, 2), dtype=np.float32)
    if k > 0:
        flow[..., 0] = dis1 * cos_p
        flow[..., 1] = -dis1 * sin_p
        flow2[..., 0] = dis2 * cos_p
        flow2[..., 1] = -dis2 * sin_p
    else:
        flow[..., 0] = -dis1 * cos_p
        flow[..., 1] = dis1 * sin_p
        flow2[..., 0] = -dis2 * cos_p
        flow2[..., 1] = dis2 * sin_p
    return flow, flow2, mask.astype(np.float32)


def gen_flow_np(height, width, k, b, line_width=5, fold_width=10, dis_k=0.1):
    """Numpy flow synthesis; returns (flow, flow2, mask)."""
    return _flow_fields_np(height, width, k, b, line_width, fold_width, dis_k)


def gen_flow(height, width, k, b, line_width=5.0, fold_width=10.0, dis_k=0.1):
    """jnp flow synthesis; scalar args may be traced. Returns (flow, flow2, mask).

    Shapes are static (height/width python ints); everything else is
    data-dependent-free so the function jits and vmaps cleanly for on-device
    batched degradation synthesis.
    """
    k = jnp.asarray(k, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    line_width = jnp.asarray(line_width, jnp.float32)
    fold_width = jnp.asarray(fold_width, jnp.float32)
    dis_k = jnp.asarray(dis_k, jnp.float32)

    gx = jnp.arange(width, dtype=jnp.float32)[None, :]
    gy = jnp.arange(height, dtype=jnp.float32)[:, None]
    dis = (k * gx - gy + b) / jnp.sqrt(k**2 + 1)

    sign = jnp.sign(dis)
    dis_abs = jnp.abs(dis)
    mask = (dis_abs > line_width).astype(jnp.float32)

    mask_dis = (dis_abs >= line_width).astype(jnp.float32)
    mask_dis2 = (dis_abs >= fold_width).astype(jnp.float32)

    dis_width = fold_width - line_width
    slope = -dis_k
    intercept = dis_width - slope * line_width
    prof = jnp.maximum(slope * dis_abs + intercept, 0.0)

    d1 = prof * mask_dis + dis_abs * (1 - mask_dis)
    d2 = prof * mask_dis2 + dis_abs * (1 - mask_dis2)
    dis1 = d1 * sign
    dis2 = -d2 * sign

    k_t = jnp.where(k == 0, 1.0 / _MINA, 1.0 / jnp.where(k == 0, 1.0, k))
    angle = jnp.arctan(k_t)
    sin_p, cos_p = jnp.sin(angle), jnp.cos(angle)

    sgn = jnp.where(k > 0, 1.0, -1.0)
    flow = jnp.stack([sgn * dis1 * cos_p, -sgn * dis1 * sin_p], axis=-1)
    flow2 = jnp.stack([sgn * dis2 * cos_p, -sgn * dis2 * sin_p], axis=-1)
    return flow, flow2, mask
