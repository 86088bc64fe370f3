"""SP interpolation (VFI) trainer — reference ``main_interp.py`` parity.

2-frame IFNet on cat(img1 x3, img4 x3) predicting sections 2 & 3; L1 on both
frames; Adam + StepLR(30, 0.5) per epoch; ``model_vfi-%d.ckpt`` saves include
the optimizer. (The reference runs the model twice to slice the two output
channels, main_interp.py:133-134 — one forward is mathematically identical.)
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sstem_tpu import losses
from sstem_tpu.cli import common
from sstem_tpu.compat.config import load_sp_config
from sstem_tpu.data.providers import Provider, SPDataset
from sstem_tpu.models import IFNet
from sstem_tpu.ops import negative_pad_2d
from sstem_tpu.train.checkpoint import restore_checkpoint
from sstem_tpu.train.loop import run_training, save_collage, to_uint8
from sstem_tpu.train.schedules import step_lr
from sstem_tpu.train.trainer import TrainState, make_optimizer, make_train_step


def vfi_inputs(batch):
    return jnp.concatenate(
        [batch["img_1"]] * 3 + [batch["img_4"]] * 3, axis=-1
    )


def build(opt_cfg, steps_per_epoch):
    model = IFNet(kernel_size=int(opt_cfg.kernel_size or 51), n_frames=2)
    schedule = step_lr(float(opt_cfg.base_lr or 1e-4), 30, 0.5,
                       steps_per_epoch=steps_per_epoch)
    opt = make_optimizer(schedule)
    pad = int(opt_cfg.PAD or 0)  # loss-crop parity (main_interp.py:137-140)

    def loss_fn(params, _, batch):
        pred = model.apply({"params": params}, vfi_inputs(batch))
        l1 = losses.l1_loss(negative_pad_2d(pred[..., 0:1], pad),
                            negative_pad_2d(batch["img_2"], pad))
        l2 = losses.l1_loss(negative_pad_2d(pred[..., 1:2], pad),
                            negative_pad_2d(batch["img_3"], pad))
        return l1 + l2, {"loss_vfi1": l1}

    train_step = make_train_step(loss_fn, opt)
    eval_fn = jax.jit(lambda params, x: model.apply({"params": params}, x))
    return model, opt, train_step, eval_fn, schedule


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", "--opt", type=str,
                        default="./config/train_interp.yaml")
    parser.add_argument("--max-iters", type=int, default=None)
    parser.add_argument("--resume-torch", type=str, default=None,
                        help="resume mid-flight from a reference torch "
                             ".ckpt (weights + Adam moments, "
                             "main_interp.py:193-196)")
    args = parser.parse_args(argv)

    cfg = load_sp_config(args.opt)
    exp_name, paths, logger, writer = common.init_project(
        "sp_interp", cfg.cache_path or "./cache", cfg.save_path or "./models"
    )
    rng = common.seed_everything(cfg.random_seed)

    ds = SPDataset(cfg.data_folder, cfg.data_txt,
                   patch_size=cfg.patch_size or 256,
                   if_rotate=bool(cfg.if_rotate),
                   if_bdadjust=bool(cfg.if_bdadjust),
                   use_vfi=bool(cfg.if_use_vfiImg))
    batch_size = cfg.batch_size or 1
    steps_per_epoch = max(len(ds) // batch_size, 1)
    provider = Provider(ds, batch_size, seed=cfg.random_seed or 0)

    model, opt, train_step, eval_fn, schedule = build(cfg, steps_per_epoch)
    p = cfg.patch_size or 256
    sample = jnp.zeros((1, p, p, 6), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(int(rng.integers(1 << 30))), sample
    )
    state = TrainState.create(variables["params"], opt)

    start_iter = 0
    if args.resume_torch:
        from sstem_tpu.compat import torch_ckpt as tc

        tv = tc.load_torch_ifnet(args.resume_torch, n_frames=2)
        opt_state, start_iter = tc.load_torch_optimizer(
            args.resume_torch, tc.load_torch_ifnet, tv["params"], opt,
            n_frames=2)
        state = state.replace(params=tv["params"], opt_state=opt_state,
                              step=jnp.asarray(start_iter, jnp.int32))
    else:
        ck = restore_checkpoint(paths["save_path"])
        if ck is not None:
            state = state.replace(params=ck["model_weights"]["params"])
            start_iter = int(ck["current_iter"])

    def preview_fn(st, batch, iters):
        b = jax.device_get(batch)
        pred = np.asarray(eval_fn(st.params, vfi_inputs(batch)[:1]))[0]
        save_collage(
            os.path.join(paths["cache_path"], "%06d.png" % iters),
            [
                [to_uint8(b["img_1"][0, :, :, 0]), to_uint8(b["img_4"][0, :, :, 0])],
                [to_uint8(pred[:, :, 0]), to_uint8(b["img_2"][0, :, :, 0])],
                [to_uint8(pred[:, :, 1]), to_uint8(b["img_3"][0, :, :, 0])],
            ],
        )

    total = args.max_iters or (int(cfg.n_epochs or 300) * steps_per_epoch)
    run_training(
        provider=provider, train_step=train_step, state=state,
        total_iters=total, cache_path=paths["cache_path"],
        save_path=paths["save_path"],
        display_freq=int(cfg.valid_freq or 100),
        save_freq=int(cfg.save_freq or 1000),
        preview_fn=preview_fn, writer=writer, logger=logger,
        start_iter=start_iter, schedule=schedule, save_optimizer=True,
        batch_stats_in_ckpt=False,
    )
    provider.close()


if __name__ == "__main__":
    main()
