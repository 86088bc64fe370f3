"""SFF interpolation trainer — reference ``main_ms.py`` parity CLI.

Usage: python -m sstem_tpu.cli.train_interp -c ms_l1loss_decay [-m train]
Accepts unmodified reference configs (config name resolved against ./config).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from sstem_tpu.cli import _sff, common
from sstem_tpu.compat.config import load_sff_config
from sstem_tpu.data.providers import (
    AugConfig, InterpTrainDataset, InterpValidDataset, Provider,
)
from sstem_tpu.models import IFNet
from sstem_tpu.parallel.mesh import make_mesh
from sstem_tpu.train.checkpoint import restore_checkpoint
from sstem_tpu.train.loop import run_training, save_collage, to_uint8
from sstem_tpu.train.trainer import TrainState, make_optimizer, make_train_step


def aug_from_cfg(data):
    a = data.AUG
    return AugConfig(
        random_fliplr=a.random_fliplr, random_flipud=a.random_flipud,
        random_flipz=a.random_flipz, random_rotation=a.random_rotation,
        swap=a.swap, color_jitter=a.color_jitter,
        brightness=a.COLOR.brightness, contrast=a.COLOR.contrast,
        saturation=a.COLOR.saturation, gauss_noise=a.gauss_noise,
        gauss_mean=a.GAUSS.gauss_mean, gauss_sigma=a.GAUSS.gauss_sigma,
        elastic_trans=a.elastic_trans, alpha_range=a.ELASTIC.alpha_range,
        sigma=a.ELASTIC.sigma, shave=a.ELASTIC.shave,
    )


def build(cfg, vgg_weights=None, data_parallel=True):
    tr = cfg.TRAIN
    model = IFNet(kernel_size=tr.kernel_size, n_frames=1)
    schedule = _sff.make_schedule(tr)
    opt = make_optimizer(schedule, weight_decay=tr.weight_decay)

    vgg_apply = _sff.load_vgg_apply(vgg_weights) if vgg_weights else None
    criterion = _sff.make_pixel_criterion(
        tr.loss, vgg_apply,
        vgg_weight=cfg.TRAIN.get("vgg_weight", 1.0),
        com_weight=cfg.TRAIN.get("com_weight", 1.0),
        loss_combine=cfg.TRAIN.get("loss_combine", "L1"),
    )

    def loss_fn(params, _, batch):
        inputs, target = batch
        pred = model.apply({"params": params}, inputs)
        return criterion(pred, target), {}

    mesh = None
    n_dev = jax.device_count()
    if data_parallel and n_dev > 1 and tr.batch_size % n_dev == 0:
        # (the reference raises on indivisible batches, main_ms.py:97-103;
        # we fall back to single-device execution instead)
        mesh = make_mesh(n_data=n_dev)

    train_step = make_train_step(loss_fn, opt, has_batch_stats=False,
                                 mesh=mesh)
    eval_fn = jax.jit(lambda params, x: model.apply({"params": params}, x))
    return model, opt, train_step, eval_fn, schedule, mesh


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str, default="ms_l1loss_decay")
    parser.add_argument("-m", "--mode", type=str, default="train")
    parser.add_argument("--config-dir", type=str, default="./config")
    parser.add_argument("--vgg-weights", type=str, default=None)
    parser.add_argument("--max-iters", type=int, default=None,
                        help="override cfg.TRAIN.total_iters")
    parser.add_argument("--device-datagen", action="store_true",
                        help="sample triplet crops from an HBM-resident "
                             "pool inside the jitted step (host streams "
                             "only the step counter); falls back to host "
                             "streaming when unsupported augs are enabled "
                             "or under a dp mesh")
    args = parser.parse_args(argv)

    cfg = load_sff_config(args.cfg, args.config_dir)
    tr = cfg.TRAIN
    exp_name, paths, logger, writer = common.init_project(
        cfg.NAME, tr.cache_path, tr.save_path
    )
    rng = common.seed_everything(tr.random_seed)

    model, opt, train_step, eval_fn, schedule, mesh = build(
        cfg, args.vgg_weights
    )

    aug = aug_from_cfg(cfg.DATA)
    ds = InterpTrainDataset(
        cfg.DATA.folder_name, cfg.DATA.train_txt,
        patch_size=tuple(cfg.DATA.patch_size), aug=aug,
    )
    pool = None
    if args.device_datagen:
        # the pool path implements crop + dihedral (+ optional frame swap)
        # on device; pixel-level augs stay on the host streaming path
        unsupported = (aug.color_jitter or aug.gauss_noise
                       or aug.elastic_trans)
        if mesh is None and not unsupported:
            pool = ds.load_pool()
        if pool is None:
            logger.warning("--device-datagen: falling back to host "
                           "streaming (dp mesh, pixel augs, or "
                           "non-uniform pool)")
        else:
            logger.info("device-datagen: HBM pool %s (%.0f MB)",
                        pool.shape, pool.nbytes / 1e6)
            from sstem_tpu.train.device_datagen import make_pool_interp_step

            train_step = make_pool_interp_step(
                model, opt, pool, tr.batch_size,
                tuple(cfg.DATA.patch_size)[0], frame_swap=aug.swap,
                seed=int(tr.random_seed or 0))
    provider = (None if pool is not None
                else Provider(ds, tr.batch_size, seed=tr.random_seed))
    valid_ds = (
        InterpValidDataset(cfg.DATA.folder_name, cfg.DATA.valid_txt)
        if tr.if_valid else None
    )

    sample_in = jnp.zeros(
        (1, cfg.DATA.patch_size[0], cfg.DATA.patch_size[1], 6), jnp.float32
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(int(rng.integers(1 << 30))),
                                    sample_in)
    state = TrainState.create(variables["params"], opt)

    start_iter = 0
    if tr.resume:
        ck = restore_checkpoint(paths["save_path"], tr.get("model_id"))
        if ck is not None:
            state = state.replace(params=ck["model_weights"]["params"])
            start_iter = int(ck["current_iter"])

    if pool is not None:
        from sstem_tpu.train.device_datagen import CounterProvider

        provider = CounterProvider(start_iter)

    def valid_fn(st, iters):
        if valid_ds is None:
            return 0.0, "psnr"
        score = _sff.psnr_valid_loop(eval_fn, st.params, valid_ds,
                                     paths["valid_path"], iters)
        return score, "psnr"

    def preview_fn(st, batch, iters):
        inputs, target = jax.device_get(batch)
        pred = np.asarray(eval_fn(st.params, inputs[:1]))[0]
        save_collage(
            os.path.join(paths["cache_path"], "%06d.png" % iters),
            [
                [to_uint8(inputs[0, :, :, 0]), to_uint8(inputs[0, :, :, 3])],
                [to_uint8(np.squeeze(pred)), to_uint8(np.squeeze(target[0]))],
            ],
        )

    total = args.max_iters or tr.total_iters
    run_training(
        provider=provider, train_step=train_step, state=state,
        total_iters=total, cache_path=paths["cache_path"],
        save_path=paths["save_path"], valid_path=paths["valid_path"],
        display_freq=tr.display_freq, valid_freq=tr.valid_freq,
        save_freq=tr.save_freq,
        valid_fn=valid_fn if tr.if_valid else None,
        preview_fn=None if pool is not None else preview_fn,
        writer=writer, logger=logger,
        start_iter=start_iter, schedule=schedule,
        batch_stats_in_ckpt=False,
    )
    provider.close()


if __name__ == "__main__":
    main()
