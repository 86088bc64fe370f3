"""SFF interp stack inference — reference ``sff_scripts_interp/inference.py``
flag surface: damaged indices from <input_path>/<txt_file>.txt, sections
%04d.png in <input_path>/<txt_file>/, outputs to
<output_path>/<txt_file>_<model_id>/; '-m valid' scores PSNR/SSIM to
scores.txt. Reference quirk preserved: predictions are written as
(pred*255).astype(uint8) without clipping (inference.py:89)."""

import argparse
import os
import time

import numpy as np
from PIL import Image

import jax.numpy as jnp

from sstem_tpu import metrics
from sstem_tpu.cli._ckpt import load_model_variables
from sstem_tpu.compat.config import load_sff_config
from sstem_tpu.infer.pipeline import SFFPipeline


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str, default="ms_l1loss_decay")
    parser.add_argument("-id", "--model_id", type=str, default="interp")
    parser.add_argument("-m", "--mode", type=str, default="valid")
    parser.add_argument("-ip", "--input_path", type=str,
                        default="../data/test/test_cremia/")
    parser.add_argument("-t", "--txt_file", type=str, default="cremia_25sff")
    parser.add_argument("-op", "--output_path", type=str,
                        default="../results/cremia/")
    parser.add_argument("--config-dir", type=str, default="./config")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="override ../trained_models/<id>/<id>.ckpt")
    args = parser.parse_args(argv)

    cfg = load_sff_config(args.cfg, args.config_dir)
    with open(os.path.join(args.input_path, args.txt_file + ".txt")) as f:
        img_list = [int(x) for x in f.read().split()]
    img_path = os.path.join(args.input_path, args.txt_file)
    output_path = os.path.join(
        args.output_path, args.txt_file + "_" + args.model_id
    )
    os.makedirs(output_path, exist_ok=True)

    ckpt = args.ckpt or os.path.join(
        "../trained_models", args.model_id, args.model_id + ".ckpt"
    )
    interp_vars = load_model_variables(ckpt, "ifnet_sff")
    pipe = SFFPipeline(interp_vars=interp_vars,
                       kernel_size=cfg.TRAIN.kernel_size,
                       pad=int(cfg.get("TEST", {}).get("pad", 0) or 0))

    total_psnr, total_ssim = [], []
    t1 = time.time()
    with open(os.path.join(output_path, "scores.txt"), "w") as f_txt:
        for k in img_list:
            img1 = np.asarray(Image.open(
                os.path.join(img_path, str(k - 1).zfill(4) + ".png")))
            img2 = np.asarray(Image.open(
                os.path.join(img_path, str(k + 1).zfill(4) + ".png")))
            pred01 = np.asarray(pipe.interpolate(
                jnp.asarray(img1[None]), jnp.asarray(img2[None]), clip=False
            ))[0]
            pred = (pred01 * 255).astype(np.uint8)
            Image.fromarray(pred).save(
                os.path.join(output_path, str(k).zfill(4) + ".png"))
            if args.mode == "valid":
                gt = np.asarray(Image.open(
                    os.path.join(img_path, str(k).zfill(4) + ".png")))
                out = metrics.compute_psnr(pred, gt)
                psnr = 1e12 if not isinstance(out, tuple) else out[1]
                ssim = metrics.compute_ssim(pred, gt)
                total_psnr.append(psnr)
                total_ssim.append(ssim)
                line = "image=%d, PSNR=%.4f, SSIM=%.4f" % (k, psnr, ssim)
                print(line)
                f_txt.write(line + "\n")
        if args.mode == "valid" and total_psnr:
            line = "mean_PSNR=%.4f, mean_SSIM=%.4f" % (
                sum(total_psnr) / len(total_psnr),
                sum(total_ssim) / len(total_ssim),
            )
            print(line)
            f_txt.write(line)
    print("COST TIME: ", time.time() - t1)


if __name__ == "__main__":
    main()
