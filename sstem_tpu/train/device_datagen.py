"""Fully on-device degradation + training (the TPU-first datagen path).

The reference degrades inside DataLoader workers on the CPU
(sff_scripts_unfolding/data/data_provider.py:180-245) — on a TPU host that
serializes a numpy warp per sample per step. Here the host streams only
clean/interp uint8 crops; fold synthesis, warping and flow-label generation
run inside the SAME jitted train step as the model
(sstem_tpu.data.sim_sff.degrade_sff_batch_jax), so datagen rides the
accelerator and overlaps with the optimizer step.
"""

import jax
import jax.numpy as jnp

from sstem_tpu.data.sim_sff import degrade_sff_batch_jax
from sstem_tpu import losses
from sstem_tpu.train.trainer import make_train_step


def make_device_datagen_loss(model, det_size=256, candidates=4,
                             line_width_range=(5, 50), label="flow",
                             seed=0):
    """Loss fn for (clean, interp) uint8 crop batches; degradation inside.

    label='flow' -> L1 on the GT unfolding flow (unfolding trainer)
    label='clean' -> L1 on the clean center crop (fusion-style)
    """

    def loss_fn(params, batch_stats, batch):
        clean, interp, step_idx = batch  # crops in 0..255 + step counter
        step_key = jax.random.fold_in(
            jax.random.PRNGKey(seed), step_idx.astype(jnp.int32)
        )
        degraded, flow2 = degrade_sff_batch_jax(
            clean, step_key, det_size=det_size, candidates=candidates,
            line_width_range=line_width_range,
        )
        off = (clean.shape[1] - det_size) // 2
        sl = slice(off, off + det_size)
        interp_c = interp[:, sl, sl].astype(jnp.float32)
        inputs = jnp.concatenate(
            [jnp.repeat((degraded / 255.0)[..., None], 3, -1),
             jnp.repeat((interp_c / 255.0)[..., None], 3, -1)], axis=-1
        )
        pred, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, inputs,
            train=True, mutable=["batch_stats"],
        )
        if label == "flow":
            target = flow2
        else:
            target = (clean[:, sl, sl].astype(jnp.float32) / 255.0)[..., None]
        return losses.l1_loss(pred, target), ({}, mut["batch_stats"])

    return loss_fn


def make_device_datagen_step(model, opt, mesh=None, **kw):
    loss_fn = make_device_datagen_loss(model, **kw)
    return make_train_step(loss_fn, opt, has_batch_stats=True, mesh=mesh)


# ---------------------------------------------------------------------------
# On-device crop sampling (HBM-resident image pool)
#
# With datagen already in-step, the remaining per-step host cost is building
# and shipping the raw crop batch (crop + dihedral on one host core, then a
# host->TPU transfer over the tunnel). Measured round 5: that wall holds the
# b16 unfolding step at ~0.55 s while the device step itself runs at ~0.09 s.
# Keeping the WHOLE training pool in HBM (uint8; 320 x 400^2 images are
# ~100 MB) and sampling crop + dihedral inside the jitted step removes the
# host from the loop entirely — the step input is one scalar counter.
# ---------------------------------------------------------------------------

def _dihedral_jax(img, r):
    """One of the 8 dihedral transforms of a square (..., H, W) array,
    selected by traced r in 0..7 (host analog: data/augment.py)."""
    def rot(k):
        return lambda x: jnp.rot90(x, k=k, axes=(-2, -1))

    img = jax.lax.switch(r % 4, [rot(k) for k in range(4)], img)
    return jax.lax.cond(r >= 4,
                        lambda x: jnp.flip(x, axis=-1),
                        lambda x: x, img)


def sample_pool_crops(pool, key, batch, crop):
    """Sample ``batch`` random square crops with dihedral augmentation from
    an HBM-resident pool, entirely on device.

    Args:
      pool: (N, F, H, W) uint8/float device array — N images of F aligned
        frames each (frames crop together: e.g. F=2 clean+interp pairs,
        F=3 interp triplets).
      key: PRNG key; batch: crops to draw; crop: crop side.

    Returns (batch, F, crop, crop) float32 in the pool's value scale.
    """
    n, f, h, w = pool.shape

    def one(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        idx = jax.random.randint(k1, (), 0, n)
        oy = jax.random.randint(k2, (), 0, h - crop + 1)
        ox = jax.random.randint(k3, (), 0, w - crop + 1)
        c = jax.lax.dynamic_slice(pool, (idx, 0, oy, ox), (1, f, crop, crop))
        r = jax.random.randint(k4, (), 0, 8)
        return _dihedral_jax(c[0].astype(jnp.float32), r)

    return jax.vmap(one)(jax.random.split(key, batch))


def make_pool_step(base_loss, opt, pool, batch, crop, seed=0,
                   has_batch_stats=True):
    """Wrap a ``(params, batch_stats, (clean, interp, step_idx))`` loss with
    on-device pool sampling: the resulting train step's ONLY input besides
    the state is the step counter — crop sampling, dihedral aug and
    whatever datagen the base loss performs all run inside one jit, reading
    an HBM-resident (N, 2, H, W) clean+interp pool.

    Single-device only (under a dp mesh each replica would need its own
    sample stream — pass the host streaming path there).
    """
    pool = jax.device_put(jnp.asarray(pool))
    assert pool.ndim == 4 and pool.shape[1] == 2, pool.shape

    def loss_fn(params, batch_stats, step_idx):
        skey = jax.random.fold_in(
            jax.random.PRNGKey(seed ^ 0x5A5A5A), step_idx.astype(jnp.int32))
        crops = sample_pool_crops(pool, skey, batch, crop)
        return base_loss(params, batch_stats,
                         (crops[:, 0], crops[:, 1], step_idx))

    return make_train_step(loss_fn, opt, has_batch_stats=has_batch_stats)


def make_pool_datagen_step(model, opt, pool, batch, crop, det_size=256,
                           candidates=4, line_width_range=(5, 50),
                           label="flow", seed=0):
    """Pool-sampled variant of ``make_device_datagen_step`` (unfolding)."""
    base_loss = make_device_datagen_loss(
        model, det_size=det_size, candidates=candidates,
        line_width_range=line_width_range, label=label, seed=seed)
    return make_pool_step(base_loss, opt, pool, batch, crop, seed=seed)


class CounterProvider:
    """Provider for pool-sampling train steps: ``next()`` yields the step
    counter (the step's only host input)."""

    def __init__(self, start_iter=0):
        import itertools

        self._c = itertools.count(start_iter + 1)

    def next(self):
        return jnp.asarray(next(self._c), jnp.int32)

    def close(self):
        pass


def make_pool_interp_step(model, opt, pool, batch, crop,
                          frame_swap=False, seed=0):
    """Interp (KPN) train step with on-device triplet sampling.

    pool: (N, 3, H, W) uint8 triplets. Builds the reference 6-channel input
    (neighbors gray-replicated x3) and 1-channel middle label on device
    (sff_scripts_interp/data/data_provider.py:93-154 semantics; the
    reference's 'random_flipz' is a spatial transpose, which the dihedral-8
    sampling already covers; frame_swap mirrors the 'swap' aug — reversed
    neighbor order — which reference configs ship disabled).
    """
    from sstem_tpu import losses as _losses

    pool = jax.device_put(jnp.asarray(pool))
    assert pool.ndim == 4 and pool.shape[1] == 3, pool.shape

    def loss_fn(params, _, step_idx):
        skey = jax.random.fold_in(
            jax.random.PRNGKey(seed ^ 0x3C3C3C), step_idx.astype(jnp.int32))
        kc, kz = jax.random.split(skey)
        crops = sample_pool_crops(pool, kc, batch, crop) / 255.0
        if frame_swap:
            rev = jax.random.bernoulli(kz, 0.5, (batch,))
            crops = jnp.where(rev[:, None, None, None],
                              crops[:, ::-1], crops)
        x = jnp.concatenate(
            [jnp.repeat(crops[:, 0, :, :, None], 3, -1),
             jnp.repeat(crops[:, 2, :, :, None], 3, -1)], axis=-1)
        y = crops[:, 1, :, :, None]
        pred = model.apply({"params": params}, x)
        return _losses.l1_loss(pred, y), {}

    return make_train_step(loss_fn, opt)
