"""SP correction (denoise) trainer — reference ``main_correction.py`` parity.

Denoising U-Net(1->1) on degraded sections 2 & 3 vs their clean versions;
Adam + StepLR(30, 0.5); auto-resume from the latest ``model_denoise-*.ckpt``
(regex-max, main_correction.py:62-76 — generalized by checkpoint.latest_step).
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
from sstem_tpu.models import UNetSP
from sstem_tpu.ops import negative_pad_2d
from sstem_tpu.train.checkpoint import restore_checkpoint
from sstem_tpu.train.loop import run_training, save_collage, to_uint8
from sstem_tpu.train.schedules import step_lr
from sstem_tpu.train.trainer import TrainState, make_optimizer, make_train_step


def build(opt_cfg, steps_per_epoch):
    model = UNetSP(n_classes=1)
    schedule = step_lr(float(opt_cfg.base_lr or 1e-4), 30, 0.5,
                       steps_per_epoch=steps_per_epoch)
    opt = make_optimizer(schedule)
    pad = int(opt_cfg.PAD or 0)  # loss-crop parity (main_correction.py:144-149)

    def loss_fn(params, batch_stats, batch):
        v = {"params": params, "batch_stats": batch_stats}
        p1, mut = model.apply(v, batch["img_2_degra"], train=True,
                              mutable=["batch_stats"])
        v2 = {"params": params, "batch_stats": mut["batch_stats"]}
        p2, mut2 = model.apply(v2, batch["img_3_degra"], train=True,
                               mutable=["batch_stats"])
        loss = losses.l1_loss(
            negative_pad_2d(p1, pad), negative_pad_2d(batch["img_2"], pad)
        ) + losses.l1_loss(
            negative_pad_2d(p2, pad), negative_pad_2d(batch["img_3"], pad)
        )
        return loss, ({}, mut2["batch_stats"])

    train_step = make_train_step(loss_fn, opt, has_batch_stats=True)
    eval_fn = jax.jit(
        lambda variables, x: model.apply(variables, x, train=False)
    )
    return model, opt, train_step, eval_fn, schedule


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", "--opt", type=str,
                        default="./config/train_correc.yaml")
    parser.add_argument("--max-iters", type=int, default=None)
    parser.add_argument("--resume-torch", type=str, default=None,
                        help="resume mid-flight from a reference torch "
                             ".ckpt (weights + Adam moments)")
    args = parser.parse_args(argv)

    cfg = load_sp_config(args.opt)
    exp_name, paths, logger, writer = common.init_project(
        "sp_correction", cfg.cache_path or "./cache",
        cfg.save_path or "./models"
    )
    rng = common.seed_everything(cfg.random_seed)

    ds = SPDataset(cfg.data_folder, cfg.data_txt,
                   patch_size=cfg.patch_size or 256,
                   if_rotate=bool(cfg.if_rotate),
                   if_bdadjust=bool(cfg.if_bdadjust))
    batch_size = cfg.batch_size or 1
    steps_per_epoch = max(len(ds) // batch_size, 1)
    provider = Provider(ds, batch_size, seed=cfg.random_seed or 0)

    model, opt, train_step, eval_fn, schedule = build(cfg, steps_per_epoch)
    p = cfg.patch_size or 256
    sample = jnp.zeros((1, p, p, 1), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(int(rng.integers(1 << 30))), sample
    )
    state = TrainState.create(variables["params"], opt,
                              batch_stats=variables["batch_stats"])

    start_iter = 0
    if args.resume_torch:
        from sstem_tpu.compat import torch_ckpt as tc

        tv = tc.load_torch_unet_sp(args.resume_torch)
        opt_state, start_iter = tc.load_torch_optimizer(
            args.resume_torch, tc.load_torch_unet_sp, tv["params"], opt)
        state = state.replace(params=tv["params"],
                              batch_stats=tv.get("batch_stats"),
                              opt_state=opt_state,
                              step=jnp.asarray(start_iter, jnp.int32))
    else:
        ck = restore_checkpoint(paths["save_path"])  # auto-resume latest
        if ck is not None:
            mw = ck["model_weights"]
            state = state.replace(params=mw["params"],
                                  batch_stats=mw.get("batch_stats"))
            start_iter = int(ck["current_iter"])

    def preview_fn(st, batch, iters):
        b = jax.device_get(batch)
        v = {"params": st.params, "batch_stats": st.batch_stats}
        pred = np.asarray(eval_fn(v, batch["img_2_degra"][:1]))[0]
        save_collage(
            os.path.join(paths["cache_path"], "%06d.png" % iters),
            [
                [to_uint8(b["img_2_degra"][0, :, :, 0]),
                 to_uint8(pred[:, :, 0]),
                 to_uint8(b["img_2"][0, :, :, 0])],
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
    )
    provider.close()


if __name__ == "__main__":
    main()
