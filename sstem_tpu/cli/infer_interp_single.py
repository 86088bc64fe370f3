"""Single-pair interpolation — ``inference_singleImage.py`` parity
(-i1/-i2/-o flags)."""

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
    parser.add_argument("-i1", "--img1", type=str, required=True)
    parser.add_argument("-i2", "--img2", type=str, required=True)
    parser.add_argument("-o", "--output", type=str, required=True)
    parser.add_argument("--config-dir", type=str, default="./config")
    parser.add_argument("--ckpt", type=str, default=None)
    args = parser.parse_args(argv)

    cfg = load_sff_config(args.cfg, args.config_dir)
    ckpt = args.ckpt or os.path.join(
        "../trained_models", args.model_id, args.model_id + ".ckpt"
    )
    pipe = SFFPipeline(
        interp_vars=load_model_variables(ckpt, "ifnet_sff"),
        kernel_size=cfg.TRAIN.kernel_size,
        pad=int(cfg.get("TEST", {}).get("pad", 0) or 0),
    )
    img1 = np.asarray(Image.open(args.img1))
    img2 = np.asarray(Image.open(args.img2))
    pred = np.asarray(pipe.interpolate(
        jnp.asarray(img1[None]), jnp.asarray(img2[None]), clip=False
    ))[0]
    Image.fromarray((pred * 255).astype(np.uint8)).save(args.output)
    print("saved", args.output)


if __name__ == "__main__":
    main()
