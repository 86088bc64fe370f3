"""SP interp test CLI — ``sp_scripts_test/test_interp.py`` parity
(-mp/-dp/-im1/-im2/-sp flags): writes vfi_1.png / vfi_2.png.

The reference crops inputs to a multiple of 4 (test_interp.py:66-68) —
insufficient for the 32x-downsampling IFNet, a latent bug; we pad to /32 and
crop back, which also handles arbitrary sizes.
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
    parser.add_argument("-mp", "--model_path", required=True)
    parser.add_argument("-dp", "--input_data_path", required=True)
    parser.add_argument("-im1", "--input_img1", required=True)
    parser.add_argument("-im2", "--input_img2", required=True)
    parser.add_argument("-sp", "--save_path", required=True)
    parser.add_argument("-mGPU", "--if_multi_gpu", default=None)
    parser.add_argument("--kernel-size", type=int, default=51)
    args = parser.parse_args(argv)

    t0 = time.time()
    pipe = SPPipeline(
        vfi_vars=load_model_variables(args.model_path, "ifnet_sp"),
        kernel_size=args.kernel_size,
    )
    img1 = np.asarray(Image.open(
        os.path.join(args.input_data_path, args.input_img1)))
    img4 = np.asarray(Image.open(
        os.path.join(args.input_data_path, args.input_img2)))
    pred = np.asarray(pipe.interp(jnp.asarray(img1[None]),
                                  jnp.asarray(img4[None])))[0]
    os.makedirs(args.save_path, exist_ok=True)
    Image.fromarray((pred[:, :, 0] * 255).astype(np.uint8)).save(
        os.path.join(args.save_path, "vfi_1.png"))
    Image.fromarray((pred[:, :, 1] * 255).astype(np.uint8)).save(
        os.path.join(args.save_path, "vfi_2.png"))
    print("It takes %fs for processing" % (time.time() - t0))


if __name__ == "__main__":
    main()
