"""SP joint fusion trainer — reference ``main_fusion.py`` (SP) parity.

Three models trained jointly with per-model learning-rate weights (config:
vfi 1e-20, denoise 1e-6 — effectively frozen), as a single jitted step:
  vfi (2-frame IFNet) -> pred1/pred2
  denoise U-Net        -> denoised 2/3
  mask blend:  fusion_in = vfi * mask_r , denoise * mask     (mode 'a' grad
               masks or mode 'b' generated masks; the reference recomputes
               mask_r = 1 - mask in the loop, main_fusion.py:198-201)
  FusionNetSP (adds inputs) -> pred
  loss = sum of 6 L1 terms, or fusion-only (if_fusion_loss_only)

The three torch Adams become one optax.multi_transform over the labeled
param tree; three reference checkpoints (model_{vfi,denoise,fusion}-%d.ckpt)
are emitted for surface parity.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sstem_tpu import losses
from sstem_tpu.ops import negative_pad_2d
from sstem_tpu.cli import common
from sstem_tpu.cli.train_sp_interp import vfi_inputs
from sstem_tpu.compat.config import load_sp_config
from sstem_tpu.data.providers import Provider, SPDataset
from sstem_tpu.models import FusionNetSP, IFNet, UNetSP
from sstem_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from sstem_tpu.train.loop import run_training, save_collage, to_uint8
from sstem_tpu.train.schedules import step_lr
from sstem_tpu.train.trainer import TrainState, make_train_step


def sp_masks(batch, mode):
    if mode == "a":
        m2 = batch["img_2_degraB1_mask_gradall"]
        m3 = batch["img_3_degraB1_mask_gradall"]
    else:
        m2 = batch["img_2_degraB1_GenGradMask"]
        m3 = batch["img_3_degraB1_GenGradMask"]
    return m2, m3, 1.0 - m2, 1.0 - m3


def sp_fusion_forward(models, variables, batch, mode, train=True):
    """Returns (pred1, pred2, vfi_preds, denoise_preds, new_batch_stats)."""
    vfi, denoise, fusion = models
    m2, m3, m2r, m3r = sp_masks(batch, mode)

    vfi_pred = vfi.apply({"params": variables["params"]["vfi"]},
                         vfi_inputs(batch))
    vfi1, vfi2 = vfi_pred[..., 0:1], vfi_pred[..., 1:2]

    bs = variables["batch_stats"]
    dvar = {"params": variables["params"]["denoise"],
            "batch_stats": bs["denoise"]}
    fvar = {"params": variables["params"]["fusion"],
            "batch_stats": bs["fusion"]}
    if train:
        den1, mut = denoise.apply(dvar, batch["img_2_degra"], train=True,
                                  mutable=["batch_stats"])
        dvar2 = {"params": variables["params"]["denoise"],
                 "batch_stats": mut["batch_stats"]}
        den2, mut2 = denoise.apply(dvar2, batch["img_3_degra"], train=True,
                                   mutable=["batch_stats"])
        p1, fmut = fusion.apply(fvar, vfi1 * m2r, den1 * m2, train=True,
                                mutable=["batch_stats"])
        fvar2 = {"params": variables["params"]["fusion"],
                 "batch_stats": fmut["batch_stats"]}
        p2, fmut2 = fusion.apply(fvar2, vfi2 * m3r, den2 * m3, train=True,
                                 mutable=["batch_stats"])
        new_bs = {"denoise": mut2["batch_stats"],
                  "fusion": fmut2["batch_stats"]}
        return p1, p2, (vfi1, vfi2), (den1, den2), new_bs
    den1 = denoise.apply(dvar, batch["img_2_degra"], train=False)
    den2 = denoise.apply(dvar, batch["img_3_degra"], train=False)
    p1 = fusion.apply(fvar, vfi1 * m2r, den1 * m2, train=False)
    p2 = fusion.apply(fvar, vfi2 * m3r, den2 * m3, train=False)
    return p1, p2, (vfi1, vfi2), (den1, den2), None


def build(cfg, steps_per_epoch):
    models = (IFNet(kernel_size=int(cfg.kernel_size or 51), n_frames=2),
              UNetSP(1), FusionNetSP(1))
    base_lr = float(cfg.base_lr or 1e-4)
    lr_weights = {
        "vfi": float(cfg.vfi_lr_weight or 1.0),
        "denoise": float(cfg.denoise_lr_weight or 1.0),
        "fusion": 1.0,
    }
    mode = cfg.mode or "b"
    fusion_only = bool(cfg.if_fusion_loss_only)

    def make_branch_opt(w):
        return optax.adam(step_lr(base_lr * w, 30, 0.5,
                                  steps_per_epoch=steps_per_epoch))

    opt = optax.multi_transform(
        {k: make_branch_opt(w) for k, w in lr_weights.items()},
        param_labels={"vfi": "vfi", "denoise": "denoise", "fusion": "fusion"},
    )

    pad = int(cfg.PAD or 0)  # loss-crop parity (main_fusion.py:228-233;
    # the reference hardcodes PAD = 0 there but keeps the crop surface)

    def crop(x):
        return negative_pad_2d(x, pad)

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        p1, p2, (v1, v2), (d1, d2), new_bs = sp_fusion_forward(
            models, variables, batch, mode, train=True
        )
        t1, t2 = crop(batch["img_2"]), crop(batch["img_3"])
        lf = losses.l1_loss(crop(p1), t1) + losses.l1_loss(crop(p2), t2)
        if fusion_only:
            loss = lf
        else:
            lv = losses.l1_loss(crop(v1), t1) + losses.l1_loss(crop(v2), t2)
            ld = losses.l1_loss(crop(d1), t1) + losses.l1_loss(crop(d2), t2)
            loss = lv + ld + lf
        return loss, ({"loss_fusion": lf}, new_bs)

    train_step = make_train_step(loss_fn, opt, has_batch_stats=True)

    def eval_fn(variables, batch):
        p1, p2, _, _, _ = sp_fusion_forward(models, variables, batch, mode,
                                            train=False)
        return p1, p2

    return models, opt, train_step, jax.jit(eval_fn), mode


def _load_branch(path, step):
    import orbax.checkpoint as ocp

    d = os.path.join(os.path.abspath(path), "model-%06d.ckpt" % step)
    return ocp.StandardCheckpointer().restore(d)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", "--opt", type=str,
                        default="./config/train_fusion.yaml")
    parser.add_argument("--max-iters", type=int, default=None)
    args = parser.parse_args(argv)

    cfg = load_sp_config(args.opt)
    exp_name, paths, logger, writer = common.init_project(
        "sp_fusion", cfg.cache_path or "./cache", cfg.save_path or "./models"
    )
    rng = common.seed_everything(cfg.random_seed)

    ds = SPDataset(cfg.data_folder, cfg.data_txt,
                   patch_size=cfg.patch_size or 256,
                   if_rotate=bool(cfg.if_rotate),
                   if_bdadjust=bool(cfg.if_bdadjust))
    batch_size = cfg.batch_size or 1
    steps_per_epoch = max(len(ds) // batch_size, 1)
    provider = Provider(ds, batch_size, seed=cfg.random_seed or 0)

    models, opt, train_step, eval_fn, mode = build(cfg, steps_per_epoch)
    vfi, denoise, fusion = models
    p = cfg.patch_size or 256
    key = jax.random.PRNGKey(int(rng.integers(1 << 30)))
    k1, k2, k3 = jax.random.split(key, 3)
    v_vfi = jax.jit(vfi.init)(k1, jnp.zeros((1, p, p, 6), jnp.float32))
    v_den = jax.jit(lambda k, x: denoise.init(k, x, train=True))(
        k2, jnp.zeros((1, p, p, 1), jnp.float32)
    )
    v_fus = jax.jit(lambda k, a, b: fusion.init(k, a, b, train=True))(
        k3, jnp.zeros((1, p, p, 1), jnp.float32),
        jnp.zeros((1, p, p, 1), jnp.float32),
    )
    params = {"vfi": v_vfi["params"], "denoise": v_den["params"],
              "fusion": v_fus["params"]}
    batch_stats = {"denoise": v_den["batch_stats"],
                   "fusion": v_fus["batch_stats"]}

    # pretrained branch loading (if_pretrained_*, resume_path + last iters)
    if cfg.if_pretrained and cfg.resume_path:
        if cfg.if_pretrained_vfi and cfg.vfi_last_iter:
            ck = _load_branch(cfg.resume_path, int(cfg.vfi_last_iter))
            params["vfi"] = ck["model_weights"]["params"]
        if cfg.if_pretrained_denoise and cfg.denoise_last_iter:
            ck = _load_branch(cfg.resume_path, int(cfg.denoise_last_iter))
            params["denoise"] = ck["model_weights"]["params"]
            batch_stats["denoise"] = ck["model_weights"]["batch_stats"]

    state = TrainState.create(params, opt, batch_stats=batch_stats)

    def preview_fn(st, batch, iters):
        b = jax.device_get(batch)
        variables = {"params": st.params, "batch_stats": st.batch_stats}
        p1, p2 = eval_fn(variables, batch)
        p1 = np.asarray(p1)[0]
        save_collage(
            os.path.join(paths["cache_path"], "%06d.png" % iters),
            [
                [to_uint8(b["img_2_degra"][0, :, :, 0]),
                 to_uint8(p1[:, :, 0]), to_uint8(b["img_2"][0, :, :, 0])],
            ],
        )

    total = args.max_iters or (int(cfg.n_epochs or 300) * steps_per_epoch)
    state = run_training(
        provider=provider, train_step=train_step, state=state,
        total_iters=total, cache_path=paths["cache_path"],
        save_path=paths["save_path"],
        display_freq=int(cfg.valid_freq or 100),
        save_freq=int(cfg.save_freq or 1000),
        preview_fn=preview_fn, writer=writer, logger=logger,
        schedule=None,
    )
    # per-branch checkpoints (surface parity with model_{vfi,denoise,fusion})
    for branch in ("vfi", "denoise", "fusion"):
        save_checkpoint(
            os.path.join(paths["save_path"], branch), int(state.step),
            state.params[branch],
            batch_stats=state.batch_stats.get(branch)
            if branch != "vfi" else None,
        )
    provider.close()


if __name__ == "__main__":
    main()
