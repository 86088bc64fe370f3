"""Shared pieces for the SFF trainers (interp / unfolding / fusion)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from sstem_tpu import losses, metrics
from sstem_tpu.train.schedules import poly_warmup_decay_lr


def make_schedule(tr):
    """cfg.TRAIN -> optax schedule (constant when base == end, main_ms.py:179)."""
    if float(tr.base_lr) == float(tr.end_lr):
        return lambda step: jnp.float32(tr.base_lr)
    return poly_warmup_decay_lr(tr.base_lr, tr.end_lr, tr.warmup_iters,
                                tr.decay_iters, tr.power)


def make_pixel_criterion(loss_name, vgg_apply=None, vgg_weight=1.0,
                         com_weight=1.0, loss_combine="L1"):
    """cfg.TRAIN.loss in {L1, L2, ssim, perceptual} (main_ms.py:149-171)."""
    if loss_name == "L1":
        return losses.l1_loss
    if loss_name == "L2":
        return losses.l2_loss
    if loss_name == "ssim":
        return losses.ssim_loss
    if loss_name == "perceptual":
        assert vgg_apply is not None, (
            "perceptual loss needs VGG19 weights — pass --vgg-weights "
            "(torch vgg19-dcbb9e9d.pth)"
        )
        return functools.partial(
            losses.perceptual_loss, vgg_apply, vgg_weight=vgg_weight,
            com_weight=com_weight, combine=loss_combine,
        )
    raise AttributeError(f"No this loss function: {loss_name}")


def load_vgg_apply(weights_path):
    from sstem_tpu.models.vgg import VGG19Features, load_torch_vgg19_features

    model = VGG19Features()
    variables = load_torch_vgg19_features(weights_path)
    return lambda x: model.apply(variables, x)


def psnr_valid_loop(eval_fn, variables, dataset, preview_path=None,
                    iters=None):
    """Average reference-parity PSNR over a map-style dataset
    (main_ms.py:250-279 semantics: clip pred to [0,1], compute_psnr)."""
    total = 0.0
    for k in range(len(dataset)):
        im, gt = dataset[k]
        pred = np.asarray(eval_fn(variables, jnp.asarray(im[None])))[0]
        pred = np.clip(np.squeeze(pred), 0.0, 1.0)
        gt = np.squeeze(gt)
        out = metrics.compute_psnr(pred, gt)
        psnr = 1e12 if not isinstance(out, tuple) else out[1]
        total += psnr
        if k == 0 and preview_path is not None:
            from sstem_tpu.train.loop import save_collage, to_uint8

            save_collage(
                os.path.join(preview_path, "%06d.png" % iters),
                [[to_uint8(pred), to_uint8(gt)]],
            )
    return total / max(len(dataset), 1)


def epe_valid_loop(eval_fn, variables, dataset):
    """Average EPE over a map-style flow dataset (main_flowfusionnet.py:266)."""
    total = 0.0
    for k in range(len(dataset)):
        im, gt_flow = dataset[k]
        pred = np.asarray(eval_fn(variables, jnp.asarray(im[None])))[0]
        total += float(
            losses.epe(jnp.asarray(pred[None]), jnp.asarray(gt_flow[None]))
        )
    return total / max(len(dataset), 1)
