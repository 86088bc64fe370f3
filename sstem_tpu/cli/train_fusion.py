"""SFF fusion trainer — reference ``main_fusion.py`` (SFF) parity:

A frozen flow FusionNet (loaded from cfg.TRAIN.flownet_path/flownet_id)
predicts the unfolding flow; the degraded channels are backward-warped with
the zero-border spatial transform; the fusion U-Net is trained with L1 (or
perceptual) loss against the clean section (main_fusion.py:213-260). The
flow + warp + U-Net composition runs inside ONE jitted step — no host
round-trips between stages.
"""

import argparse
import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np

from sstem_tpu import losses
from sstem_tpu.cli import _sff, common
from sstem_tpu.cli.train_interp import aug_from_cfg
from sstem_tpu.compat.config import load_sff_config
from sstem_tpu.data.providers import FusionTrainDataset, FusionValidDataset, Provider
from sstem_tpu.models import FusionNet, UNetSFF
from sstem_tpu.ops import spatial_transform
from sstem_tpu.parallel.mesh import make_mesh
from sstem_tpu.train.checkpoint import restore_checkpoint
from sstem_tpu.train.loop import run_training, save_collage, to_uint8
from sstem_tpu.train.trainer import TrainState, make_optimizer, make_train_step


def compose_forward(flow_model, flow_vars, unet, unet_vars, inputs,
                    train=False, mutable=False, flow_train_mode=False):
    """Frozen flow -> warp degraded channels -> fusion U-Net.

    flow_train_mode: the reference freezes the flow net in EVAL mode in the
    trainer (``model_flow.eval()``, sff_scripts_fusion/main_fusion.py:189),
    so its BatchNorms use running statistics during fusion training exactly
    as they do at inference. Defaults to False (eval mode) to match; True
    reproduces the round<=4 behavior (batch statistics while training),
    which skewed the U-Net's training-time warp distribution away from the
    serving-time one (diagnosed in tools/diagnose_fusion.py, round 5).
    """
    if flow_train_mode:
        flow, _ = flow_model.apply(flow_vars, inputs, train=True,
                                   mutable=["batch_stats"])
    else:
        flow = flow_model.apply(flow_vars, inputs, train=False)
    flow = jax.lax.stop_gradient(flow)
    warped = spatial_transform(inputs[..., 0:3], flow)
    fused_in = jnp.concatenate([warped, inputs[..., 3:6]], axis=-1)
    if mutable:
        return unet.apply(unet_vars, fused_in, train=train,
                          mutable=["batch_stats"])
    return unet.apply(unet_vars, fused_in, train=train)


def build(cfg, flow_vars, data_parallel=True):
    tr = cfg.TRAIN
    flow_model = FusionNet(output_nc=2, ngf=tr.ngf)
    unet = UNetSFF(out_channel=tr.output_nc)
    schedule = _sff.make_schedule(tr)
    opt = make_optimizer(schedule, weight_decay=tr.weight_decay)

    def loss_fn(params, batch_stats, batch):
        inputs, target = batch
        pred, mut = compose_forward(
            flow_model, flow_vars, unet,
            {"params": params, "batch_stats": batch_stats},
            inputs, train=True, mutable=True,
        )
        return losses.l1_loss(pred, target), ({}, mut["batch_stats"])

    mesh = None
    n_dev = jax.device_count()
    if data_parallel and n_dev > 1 and tr.batch_size % n_dev == 0:
        mesh = make_mesh(n_data=n_dev)

    train_step = make_train_step(loss_fn, opt, has_batch_stats=True, mesh=mesh)

    def eval_fn(unet_vars, x):
        return compose_forward(flow_model, flow_vars, unet, unet_vars, x,
                               train=False)

    return unet, flow_model, opt, train_step, jax.jit(eval_fn), schedule, mesh


def make_fusion_devgen_loss(cfg, flow_vars, flow_model, unet, det_size):
    """Fusion devgen loss core — fold synthesis + frozen-flow warp + U-Net
    on a (clean, interp, step_idx) raw-crop batch; shared by the streaming
    and HBM-pool step variants."""
    from sstem_tpu.data.sim_sff import degrade_sff_batch_jax

    seed = int(cfg.TRAIN.random_seed or 0)

    def loss_fn(params, batch_stats, batch):
        clean, interp, step_idx = batch  # crops in 0..255 + step counter
        step_key = jax.random.fold_in(
            jax.random.PRNGKey(seed), step_idx.astype(jnp.int32))
        degraded, _ = degrade_sff_batch_jax(
            clean, step_key, det_size=det_size,
            line_width_range=(5, 20))
        off = (clean.shape[1] - det_size) // 2
        sl = slice(off, off + det_size)
        interp_c = interp[:, sl, sl].astype(jnp.float32)
        inputs = jnp.concatenate(
            [jnp.repeat((degraded / 255.0)[..., None], 3, -1),
             jnp.repeat((interp_c / 255.0)[..., None], 3, -1)], axis=-1)
        pred, mut = compose_forward(
            flow_model, flow_vars, unet,
            {"params": params, "batch_stats": batch_stats},
            inputs, train=True, mutable=True)
        target = (clean[:, sl, sl].astype(jnp.float32) / 255.0)[..., None]
        return losses.l1_loss(pred, target), ({}, mut["batch_stats"])

    return loss_fn


def make_fusion_devgen_step(cfg, flow_vars, opt, mesh, flow_model, unet,
                            det_size):
    """Fusion train step with ON-DEVICE datagen: fold synthesis + warp of
    the clean crop, the frozen-flow warp and the U-Net all inside one jit
    (train/device_datagen.py pattern; replaces the reference's CPU-worker
    degradation, sff_scripts_fusion/data/data_provider.py:163-185 — note
    the fusion variant's narrower line_width 5..20)."""
    from sstem_tpu.train.trainer import make_train_step

    loss_fn = make_fusion_devgen_loss(cfg, flow_vars, flow_model, unet,
                                      det_size)
    return make_train_step(loss_fn, opt, has_batch_stats=True, mesh=mesh)


def load_flow_variables(path):
    """Load flow-net variables from an orbax ckpt dir or a torch .ckpt file."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ck = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        mw = ck["model_weights"]
        return {"params": mw["params"], "batch_stats": mw["batch_stats"]}
    from sstem_tpu.compat.torch_ckpt import load_torch_fusionnet

    return load_torch_fusionnet(path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str,
                        default="sff_fusion_L1_lr0001decay")
    parser.add_argument("-m", "--mode", type=str, default="train")
    parser.add_argument("--config-dir", type=str, default="./config")
    parser.add_argument("--max-iters", type=int, default=None)
    parser.add_argument("--device-datagen", action="store_true",
                        help="run fold synthesis + the frozen-flow warp + "
                             "labels inside the jitted train step (host "
                             "streams raw crops only)")
    parser.add_argument("--resume-from", type=str, default=None,
                        help="save dir of a PREVIOUS run to continue from "
                             "(cross-run resume: picks its latest "
                             "model-*.ckpt; new checkpoints go to this "
                             "run's own timestamped dir)")
    args = parser.parse_args(argv)

    cfg = load_sff_config(args.cfg, args.config_dir)
    tr = cfg.TRAIN
    exp_name, paths, logger, writer = common.init_project(
        cfg.NAME, tr.cache_path, tr.save_path
    )
    rng = common.seed_everything(tr.random_seed)

    flow_vars = load_flow_variables(
        os.path.join(tr.flownet_path, tr.flownet_id)
    )
    unet, flow_model, opt, train_step, eval_fn, schedule, mesh = build(
        cfg, flow_vars
    )

    pool = None
    if args.device_datagen:
        from sstem_tpu.data.providers import RawCropPairDataset
        from sstem_tpu.train.device_datagen import make_pool_step

        ds = RawCropPairDataset(
            cfg.DATA.folder_name, cfg.DATA.train_txt,
            cfg.DATA.interp_train_txt, crop_size=cfg.DATA.patch_size[0],
            aug=aug_from_cfg(cfg.DATA),
        )
        # HBM-resident crop pool when possible (single device, uniform
        # image sizes): host streams only the step counter
        if mesh is None:
            pool = ds.load_pool()
        if pool is not None:
            logger.info("device-datagen: HBM pool %s (%.0f MB)",
                        pool.shape, pool.nbytes / 1e6)
            raw_step = make_pool_step(
                make_fusion_devgen_loss(cfg, flow_vars, flow_model, unet,
                                        det_size=cfg.DATA.get("det_size",
                                                              256)),
                opt, pool, tr.batch_size, cfg.DATA.patch_size[0],
                seed=int(tr.random_seed or 0))
        else:
            raw_step = make_fusion_devgen_step(
                cfg, flow_vars, opt, mesh, flow_model, unet,
                det_size=cfg.DATA.get("det_size", 256))
    else:
        ds = FusionTrainDataset(
            cfg.DATA.folder_name, cfg.DATA.train_txt,
            cfg.DATA.interp_train_txt,
            crop_size=cfg.DATA.patch_size[0],
            det_size=cfg.DATA.get("det_size", 256),
            gt_line=cfg.DATA.get("gt_line", False),
            aug=aug_from_cfg(cfg.DATA),
        )
    provider = (None if pool is not None
                else Provider(ds, tr.batch_size, seed=tr.random_seed))
    valid_ds = None
    if tr.if_valid and cfg.DATA.get("valid_txt"):
        try:
            valid_ds = FusionValidDataset(cfg.DATA.folder_name,
                                          cfg.DATA.valid_txt)
        except FileNotFoundError:
            logger.warning("valid list missing; validation disabled")

    det = cfg.DATA.get("det_size", 256)
    sample_in = jnp.zeros((1, det, det, 6), jnp.float32)
    variables = jax.jit(lambda k, x: unet.init(k, x, train=True))(
        jax.random.PRNGKey(int(rng.integers(1 << 30))), sample_in
    )
    state = TrainState.create(variables["params"], opt,
                              batch_stats=variables["batch_stats"])

    start_iter = 0
    resume_dir = args.resume_from or (paths["save_path"] if tr.resume
                                      else None)
    if resume_dir:
        ck = restore_checkpoint(resume_dir,
                                None if args.resume_from
                                else tr.get("model_id"))
        if ck is not None:
            mw = ck["model_weights"]
            state = state.replace(params=mw["params"],
                                  batch_stats=mw.get("batch_stats"))
            start_iter = int(ck["current_iter"])
            if "optimizer_weights" in ck:
                # Restore the optimizer state BY STRUCTURE: re-read the
                # checkpoint with the live optax tree as the orbax target,
                # so every moment lands on its named field (a flat-order
                # rehang could silently misassign equal-leaf-count states;
                # ADVICE r4).
                try:
                    template = dict(ck)
                    template["optimizer_weights"] = state.opt_state
                    ck2 = restore_checkpoint(resume_dir, start_iter,
                                             template=template)
                    state = state.replace(
                        opt_state=ck2["optimizer_weights"])
                except Exception:  # pragma: no cover - diagnostic path
                    logger.warning("optimizer state in checkpoint did not "
                                   "match; Adam moments restart")
            else:
                logger.info("resumed at iter %d without optimizer state "
                            "(Adam moments restart)", start_iter)

    if args.device_datagen and pool is not None:
        from sstem_tpu.train.device_datagen import CounterProvider

        provider = CounterProvider(start_iter)
        train_step = raw_step  # noqa: F811 - batch IS the step counter
    elif args.device_datagen:
        # Degradation RNG keys off the iteration index: resume at
        # start_iter continues the synthetic stream instead of replaying
        # it from step 1, and the local counter is never shared across
        # trainers in one process (ADVICE r3).
        step_counter = itertools.count(start_iter + 1)

        def train_step(state, batch):  # noqa: F811 - datagen-in-step
            clean, interp = batch
            return raw_step(state, (clean, interp,
                                    jnp.asarray(next(step_counter))))

    def valid_fn(st, iters):
        if valid_ds is None:
            return 0.0, "psnr"
        v = {"params": st.params, "batch_stats": st.batch_stats}
        return _sff.psnr_valid_loop(eval_fn, v, valid_ds,
                                    paths["valid_path"], iters), "psnr"

    def preview_fn(st, batch, iters):
        inputs, target = jax.device_get(batch)
        v = {"params": st.params, "batch_stats": st.batch_stats}
        pred = np.asarray(eval_fn(v, inputs[:1]))[0]
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
        save_freq=tr.save_freq, valid_fn=valid_fn,
        preview_fn=None if args.device_datagen else preview_fn,
        writer=writer, logger=logger,
        start_iter=start_iter, schedule=schedule,
        save_optimizer=True,
    )
    provider.close()


if __name__ == "__main__":
    main()
