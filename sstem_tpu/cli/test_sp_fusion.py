"""SP full restoration test CLI — ``sp_scripts_test/test_fusion.py`` parity
(-mp/-dp/-im1/-im2d/-im2m/-im3d/-im3m/-im4/-sp): loads the vfi/denoise/
fusion checkpoints, runs VFI + denoise + mask blend + fusion, writes
pred1.png / pred2.png.

Checkpoint layout: ``--model_path`` may be a directory containing
``vfi/``, ``denoise/``, ``fusion/`` checkpoint dirs (our trainer layout) or
three explicit paths via --vfi/--denoise/--fusion.
"""

import argparse
import os
import time

import numpy as np
from PIL import Image

import jax.numpy as jnp

from sstem_tpu.cli._ckpt import load_model_variables
from sstem_tpu.infer.pipeline import SPPipeline


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-mp", "--model_path", default=None)
    parser.add_argument("--vfi", default=None)
    parser.add_argument("--denoise", default=None)
    parser.add_argument("--fusion", default=None)
    parser.add_argument("-dp", "--input_data_path", required=True)
    parser.add_argument("-im1", "--img1", required=True)
    parser.add_argument("-im2d", "--im2_degra", required=True)
    parser.add_argument("-im2m", "--im2_mask", required=True)
    parser.add_argument("-im3d", "--im3_degra", required=True)
    parser.add_argument("-im3m", "--im3_mask", required=True)
    parser.add_argument("-im4", "--img4", required=True)
    parser.add_argument("-sp", "--save_path", required=True)
    parser.add_argument("-mGPU", "--if_multi_gpu", default=None)
    parser.add_argument("--kernel-size", type=int, default=51)
    args = parser.parse_args(argv)

    t0 = time.time()
    vfi = args.vfi or os.path.join(args.model_path, "vfi")
    den = args.denoise or os.path.join(args.model_path, "denoise")
    fus = args.fusion or os.path.join(args.model_path, "fusion")
    pipe = SPPipeline(
        vfi_vars=load_model_variables(vfi, "ifnet_sp"),
        denoise_vars=load_model_variables(den, "unet_sp"),
        fusion_vars=load_model_variables(fus, "unet_sp"),
        kernel_size=args.kernel_size,
    )

    def rd(name):
        return np.asarray(Image.open(os.path.join(args.input_data_path, name)))

    out = pipe.restore(
        jnp.asarray(rd(args.img1)[None]), jnp.asarray(rd(args.img4)[None]),
        jnp.asarray(rd(args.im2_degra)[None]),
        jnp.asarray(rd(args.im3_degra)[None]),
        jnp.asarray(rd(args.im2_mask)[None]),
        jnp.asarray(rd(args.im3_mask)[None]),
    )
    os.makedirs(args.save_path, exist_ok=True)
    Image.fromarray(
        (np.asarray(out["pred1"])[0] * 255).astype(np.uint8)
    ).save(os.path.join(args.save_path, "pred1.png"))
    Image.fromarray(
        (np.asarray(out["pred2"])[0] * 255).astype(np.uint8)
    ).save(os.path.join(args.save_path, "pred2.png"))
    print("It takes %fs for processing" % (time.time() - t0))


if __name__ == "__main__":
    main()
