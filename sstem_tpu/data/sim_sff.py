"""SFF (support-film-fold) degradation synthesis.

Three entry points covering the reference's three uses:
  * ``degrade_sff`` — the train-time inline degradation
    (sff_scripts_unfolding/data/data_provider.py:180-245): random fold line
    between two distinct borders, gen_flow, bilinear warp, black fold strip,
    center-crop 400^2 -> 256^2, resample until >= 100 zero pixels.
  * ``SimuSFF`` — the offline simulator (simu_sff/simuSFF.py:14-144):
    endpoint distance >= size/2, line_width 5..20, optional regional-contrast
    noise box, saves ``*_SimuSFF.png``.
  * ``degrade_sff_batch_jax`` — the TPU-native path: a jit/vmap batched
    degradation entirely on device. The unbounded host retry loop becomes a
    bounded candidate draw: R parameter sets are sampled per image, all R
    degradations are synthesized (vectorized), and the first candidate whose
    fold strip covers >= min_zero pixels is selected (lax-friendly argmax).
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sstem_tpu.ops.flow import gen_flow, gen_flow_np, gen_line
from sstem_tpu.ops.warp import image_warp as image_warp_jax


# ---------------------------------------------------------------------------
# Host (numpy) reference-exact path
# ---------------------------------------------------------------------------

def _np_image_warp_bilinear(im, flow):
    """uint8-returning numpy warp (reference image_warp semantics)."""
    out = np.asarray(
        image_warp_jax(
            jnp.asarray(im[None, :, :, None], jnp.float32),
            jnp.asarray(flow[None]),
            "bilinear",
        )
    )[0, :, :, 0]
    return out.astype(np.uint8)


def _sample_endpoints(rng, height, width, min_dist=0.0):
    """Two random points on distinct borders, optionally >= min_dist apart.

    Border ids (flow_synthesis.py:99-133): 1 top (0,x), 2 right (x,width),
    3 bottom (height,x), 4 left (x,0); stored [row, col]."""
    while True:
        k1 = rng.integers(1, 5)
        k2 = rng.integers(1, 5)
        while k1 == k2:
            k2 = rng.integers(1, 5)

        def point(k):
            if k == 1:
                return [0, int(rng.integers(1, width))]
            if k == 2:
                return [int(rng.integers(1, height)), width]
            if k == 3:
                return [height, int(rng.integers(1, width))]
            return [int(rng.integers(1, height)), 0]

        p1, p2 = point(k1), point(k2)
        d = math.hypot(p1[0] - p2[0], p1[1] - p2[1])
        if d >= min_dist:
            return p1, p2


def sample_fold_params(rng, height, width, line_width_range=(5, 50),
                       fold_width_max=80, dis_k_range=(1e-5, 0.1),
                       min_endpoint_dist=0.0):
    """Random fold parameters (k, b, line_width, fold_width, dis_k)."""
    line_width = int(rng.integers(line_width_range[0], line_width_range[1] + 1))
    fold_width = int(rng.integers(line_width + 1, fold_width_max + 1))
    p1, p2 = _sample_endpoints(rng, height, width, min_endpoint_dist)
    dis_k = float(rng.uniform(*dis_k_range))
    k, b = gen_line(p1, p2)
    return dict(k=k, b=b, line_width=line_width, fold_width=fold_width,
                dis_k=dis_k)


def degrade_sff(img, rng, det_size=256, line_width_range=(5, 50),
                fold_width_max=80, min_zero=100, max_tries=1000):
    """Degrade one clean crop (H, W) uint8; returns dict with center-cropped
    ``degraded``, ``flow`` (clean->folded), ``flow2`` (GT unfolding flow),
    and ``params``. Resamples until the fold strip covers >= min_zero pixels
    of the center crop (data_provider.py:236-241), with a bounded try count.
    """
    height, width = img.shape
    off = (height - det_size) // 2
    for _ in range(max_tries):
        p = sample_fold_params(rng, height, width, line_width_range,
                               fold_width_max)
        flow, flow2, mask = gen_flow_np(height, width, p["k"], p["b"],
                                        p["line_width"], p["fold_width"],
                                        p["dis_k"])
        deformed = _np_image_warp_bilinear(img, flow)
        deformed = (deformed * mask).astype(np.uint8)
        sl = slice(off, -off) if off else slice(None)
        deformed_c = deformed[sl, sl]
        if int((deformed_c == 0).sum()) >= min_zero:
            return dict(
                degraded=deformed_c,
                flow=flow[sl, sl],
                flow2=flow2[sl, sl].astype(np.float32),
                mask=mask[sl, sl],
                params=p,
            )
    raise RuntimeError("degrade_sff: no valid fold found")


@dataclass
class SimuSFF:
    """Offline SFF simulator (simu_sff/simuSFF.py parity).

    Usage: ``SimuSFF(size=1024)(img, rng)`` -> (degraded, flow, mask).
    Differences from the train-time path: endpoints must be >= size/2 apart
    (simuSFF.py:96-112), line_width 5..20, optional regional-contrast noise
    box 50..200 px with alpha U(0.4, 1.0) (simuSFF.py:132-144).
    """

    size: int = 1024
    apply_noise: bool = True
    min_zero: int = 100
    max_tries: int = 1000

    def __call__(self, img, rng):
        height = width = self.size
        assert img.shape[0] >= height and img.shape[1] >= width
        i = int(rng.integers(0, img.shape[0] - height + 1))
        j = int(rng.integers(0, img.shape[1] - width + 1))
        crop = img[i:i + height, j:j + width]

        for _ in range(self.max_tries):
            p = sample_fold_params(
                rng, height, width, line_width_range=(5, 20),
                fold_width_max=80, min_endpoint_dist=height / 2,
            )
            flow, _, mask = gen_flow_np(height, width, p["k"], p["b"],
                                        p["line_width"], p["fold_width"],
                                        p["dis_k"])
            deformed = _np_image_warp_bilinear(crop, flow)
            deformed = (deformed * mask).astype(np.uint8)
            if int((deformed == 0).sum()) >= self.min_zero:
                if self.apply_noise:
                    deformed = self.noise(deformed, rng)
                return deformed, flow, mask
        raise RuntimeError("SimuSFF: no valid fold found")

    def noise(self, img, rng):
        """Regional contrast box (simuSFF.py:132-144)."""
        img = img.astype(np.float32)
        mask = (img != 0).astype(np.float32)
        alpha = rng.uniform(0.4, 1.0)
        h = int(rng.integers(50, 201))
        w = int(rng.integers(50, 201))
        y = int(rng.integers(0, self.size - h + 1))
        x = int(rng.integers(0, self.size - w + 1))
        box = img[y:y + h, x:x + w]
        img[y:y + h, x:x + w] = alpha * (box - img.mean()) + img.mean()
        img = np.clip(img * mask, 0, 255)
        return img.astype(np.uint8)


# ---------------------------------------------------------------------------
# Device (jax) batched path
# ---------------------------------------------------------------------------

def _sample_fold_params_jax(key, height, width, line_lo, line_hi, fold_max,
                            dis_lo, dis_hi):
    """Vectorizable fold-parameter sampling with jax.random.

    Distributional parity with the host sampler (not bitwise — different RNG).
    """
    k_lw, k_fw, k_b1, k_b2, k_x1, k_x2, k_dk = jax.random.split(key, 7)
    line_width = jax.random.randint(k_lw, (), line_lo, line_hi + 1)
    # fold_width ~ U{line_width+1 .. fold_max} with a traced lower bound
    span = (fold_max - line_width).astype(jnp.float32)
    u = jax.random.uniform(k_fw, ())
    fold_width = line_width + 1 + jnp.floor(u * span).astype(jnp.int32)

    b1 = jax.random.randint(k_b1, (), 0, 4)
    shift = jax.random.randint(k_b2, (), 1, 4)
    b2 = (b1 + shift) % 4  # distinct border

    def border_point(b, kx):
        x_w = jax.random.randint(kx, (), 1, width).astype(jnp.float32)
        x_h = jax.random.randint(kx, (), 1, height).astype(jnp.float32)
        # borders 0..3 = top, right, bottom, left; returns (row, col)
        row = jnp.select(
            [b == 0, b == 1, b == 2, b == 3],
            [0.0, x_h, float(height), x_h],
        )
        col = jnp.select(
            [b == 0, b == 1, b == 2, b == 3],
            [x_w, float(width), x_w, 0.0],
        )
        return row, col

    r1, c1 = border_point(b1, k_x1)
    r2, c2 = border_point(b2, k_x2)
    denom = jnp.where(c2 - c1 == 0, 1e-9, c2 - c1)
    k = (r2 - r1) / denom
    b = r1 - k * c1
    dis_k = jax.random.uniform(k_dk, (), minval=dis_lo, maxval=dis_hi)
    return k, b, line_width.astype(jnp.float32), fold_width.astype(jnp.float32), dis_k


def degrade_sff_batch_jax(images, key, det_size=256, candidates=4,
                          line_width_range=(5, 50), fold_width_max=80,
                          dis_k_range=(1e-5, 0.1), min_zero=100):
    """On-device batched SFF degradation.

    Args:
      images: (B, H, W) float or uint8 clean crops (values 0..255).
      key: PRNG key.
      det_size: center-crop size of the returned degraded/label fields.
      candidates: fold parameter draws per image; the first whose strip covers
        >= min_zero zero pixels is selected (bounded replacement for the
        reference's unbounded retry loop).

    Returns:
      degraded (B, det, det) float32 in 0..255, flow2 (B, det, det, 2).
    """
    b, height, width = images.shape
    off = (height - det_size) // 2
    sl = slice(off, off + det_size)

    def one_candidate(img, ck):
        k, bb, lw, fw, dk = _sample_fold_params_jax(
            ck, height, width, line_width_range[0], line_width_range[1],
            fold_width_max, dis_k_range[0], dis_k_range[1],
        )
        flow, flow2, mask = gen_flow(height, width, k, bb, lw, fw, dk)
        warped = image_warp_jax(
            img[None, :, :, None].astype(jnp.float32), flow[None], "bilinear"
        )[0, :, :, 0]
        # uint8 truncation parity with the host path
        deformed = jnp.floor(jnp.clip(warped, 0, 255)) * mask
        deformed_c = deformed[sl, sl]
        count = jnp.sum(deformed_c == 0)
        return deformed_c, flow2[sl, sl], count

    def one_image(img, ik):
        cks = jax.random.split(ik, candidates)
        degs, flows, counts = jax.vmap(lambda ck: one_candidate(img, ck))(cks)
        valid = counts >= min_zero
        # first valid candidate, else the one with the largest strip
        first = jnp.argmax(valid)
        fallback = jnp.argmax(counts)
        idx = jnp.where(jnp.any(valid), first, fallback)
        return degs[idx], flows[idx]

    keys = jax.random.split(key, b)
    return jax.vmap(one_image)(images.astype(jnp.float32), keys)
