"""SFF full-pipeline inference — ``sff_scripts_fusion/inference.py`` parity:
interp-stage outputs + degraded sections -> flow -> warp -> fusion U-Net,
plus the stitching composite and Middlebury flow renderings; '-m valid'
scores PSNR/SSIM; per-stage timers printed.

``--with-inputs`` reads externally corrected inputs (*_GFcorrect), covering
``inference_fusion_wInputs.py``.
"""

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
from sstem_tpu.ops.flow_display import dense_flow


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str,
                        default="sff_fusion_L1_lr0001decay")
    parser.add_argument("-id", "--model_id", type=str, default="fusion")
    parser.add_argument("-fm", "--flow_model", type=str,
                        default="unfolding_fusionnet")
    parser.add_argument("-m", "--mode", type=str, default="valid")
    parser.add_argument("-ip", "--input_path", type=str,
                        default="../data/test/test_cremic/")
    parser.add_argument("-t", "--txt_file", type=str, default="cremic_25sff")
    parser.add_argument("-op", "--output_path", type=str,
                        default="../results/cremic")
    parser.add_argument("--with-inputs", action="store_true",
                        help="read externally corrected *_GFcorrect inputs "
                             "(inference_fusion_wInputs.py)")
    parser.add_argument("--interp-dir", type=str, default=None)
    parser.add_argument("--config-dir", type=str, default="./config")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--flow-ckpt", type=str, default=None)
    args = parser.parse_args(argv)

    if "flownet" in args.flow_model.lower() and \
            "fusionnet" not in args.flow_model:
        raise SystemExit(
            "FlowNetC/FlowNetS are referenced by the original scripts but "
            "absent from the repo; only the FusionNet flow backbone exists."
        )

    cfg = load_sff_config(args.cfg, args.config_dir)
    flow_ckpt = args.flow_ckpt or os.path.join(
        "../trained_models", args.flow_model, args.flow_model + ".ckpt"
    )
    fusion_ckpt = args.ckpt or os.path.join(
        "../trained_models", args.model_id, args.model_id + ".ckpt"
    )
    pipe = SFFPipeline(
        interp_vars=None,
        flow_vars=load_model_variables(flow_ckpt, "fusionnet"),
        fusion_vars=load_model_variables(fusion_ckpt, "unet_sff"),
        ngf=cfg.TRAIN.ngf,
    )

    with open(os.path.join(args.input_path, args.txt_file + ".txt")) as f:
        img_list = [int(x) for x in f.read().split()]
    sff_path = os.path.join(args.input_path, args.txt_file)
    interp_dir = args.interp_dir or os.path.join(
        args.output_path, args.txt_file + "_interp"
    )
    suffix = "_GFcorrect" if args.with_inputs else ""
    fusion_path = os.path.join(
        args.output_path, args.txt_file + "_" + args.model_id + suffix)
    flow_path = fusion_path + "_flow"
    stitch_path = fusion_path + "_stitching"
    for p in (fusion_path, flow_path, stitch_path):
        os.makedirs(p, exist_ok=True)

    total_psnr, total_ssim, pred_time = [], [], []
    t_start = time.time()
    with open(os.path.join(fusion_path, "scores.txt"), "w") as f_txt:
        for k in img_list:
            name = str(k).zfill(4) + suffix + ".png"
            sff = np.asarray(Image.open(os.path.join(sff_path, name)))
            interp = np.asarray(Image.open(
                os.path.join(interp_dir, str(k).zfill(4) + ".png")))
            t0 = time.time()
            out = pipe.restore(jnp.asarray(sff[None]),
                               jnp.asarray(interp[None]))
            pred = (np.asarray(out["fused"])[0] * 255).astype(np.uint8)
            pred_time.append(time.time() - t0)
            stitch = (np.asarray(out["stitch"])[0] * 255).astype(np.uint8)
            flow_np = np.asarray(out["flow"])[0]
            Image.fromarray(pred).save(os.path.join(fusion_path,
                                                    str(k).zfill(4) + ".png"))
            Image.fromarray(stitch).save(
                os.path.join(stitch_path, str(k).zfill(4) + ".png"))
            Image.fromarray(dense_flow(flow_np)).save(
                os.path.join(flow_path, str(k).zfill(4) + ".png"))
            if args.mode == "valid":
                gt = np.asarray(Image.open(
                    os.path.join(args.input_path, args.txt_file,
                                 str(k).zfill(4) + ".png")))
                o = metrics.compute_psnr(pred, gt)
                psnr = 1e12 if not isinstance(o, tuple) else o[1]
                ssim = metrics.compute_ssim(pred, gt)
                total_psnr.append(psnr)
                total_ssim.append(ssim)
                line = "image=%d, PSNR=%.4f, SSIM=%.4f" % (k, psnr, ssim)
                print(line)
                f_txt.write(line + "\n")
        if args.mode == "valid" and total_psnr:
            line = "mean_PSNR=%.4f, mean_SSIM=%.4f" % (
                np.mean(total_psnr), np.mean(total_ssim))
            print(line)
            f_txt.write(line + "\n")
    print("average inference time: %f" % np.mean(pred_time))
    print("COST TIME: ", time.time() - t_start)


if __name__ == "__main__":
    main()
