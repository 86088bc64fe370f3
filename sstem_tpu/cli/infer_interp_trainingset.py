"""Interp over the training triplet list — ``inference_trainingset.py``
parity: writes interp_train_data/%04d.png + interp_train_data.txt consumed
by the unfolding/fusion trainers."""

import argparse
import os

import numpy as np
from PIL import Image

import jax.numpy as jnp

from sstem_tpu.cli._ckpt import load_model_variables
from sstem_tpu.compat.config import load_sff_config
from sstem_tpu.infer.pipeline import SFFPipeline


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str, default="ms_l1loss_decay")
    parser.add_argument("-id", "--model_id", type=str, default="interp")
    parser.add_argument("-bs", "--batch_size", type=int, default=1)
    parser.add_argument("--config-dir", type=str, default="./config")
    parser.add_argument("--ckpt", type=str, default=None)
    args = parser.parse_args(argv)

    cfg = load_sff_config(args.cfg, args.config_dir)
    folder = cfg.DATA.folder_name
    with open(os.path.join(folder, cfg.DATA.train_txt)) as f:
        rows = [r.split() for r in f.read().splitlines() if r.strip()]

    ckpt = args.ckpt or os.path.join(
        "../trained_models", args.model_id, args.model_id + ".ckpt"
    )
    pipe = SFFPipeline(
        interp_vars=load_model_variables(ckpt, "ifnet_sff"),
        kernel_size=cfg.TRAIN.kernel_size,
        pad=int(cfg.get("TEST", {}).get("pad", 0) or 0),
    )

    out_dir = os.path.join(folder, "interp_train_data")
    os.makedirs(out_dir, exist_ok=True)
    names = []
    bs = args.batch_size
    for s in range(0, len(rows), bs):
        chunk = rows[s:s + bs]
        img1 = np.stack([
            np.asarray(Image.open(os.path.join(folder, r[0]))) for r in chunk
        ])
        img3 = np.stack([
            np.asarray(Image.open(os.path.join(folder, r[2]))) for r in chunk
        ])
        preds = np.asarray(pipe.interpolate(
            jnp.asarray(img1), jnp.asarray(img3), clip=False
        ))
        for j in range(len(chunk)):
            name = os.path.join(
                "interp_train_data", "%04d.png" % (s + j)
            )
            Image.fromarray(
                (preds[j] * 255).astype(np.uint8)
            ).save(os.path.join(folder, name))
            names.append(name)
    with open(os.path.join(folder, "interp_train_data.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    print("wrote %d interp images" % len(names))


if __name__ == "__main__":
    main()
