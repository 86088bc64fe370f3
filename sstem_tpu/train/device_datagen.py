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
