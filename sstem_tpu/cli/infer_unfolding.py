"""SFF unfolding inference — ``sff_scripts_unfolding/inference.py`` parity:
flow prediction -> warp -> unfolded image + Middlebury flow rendering; valid
mode reads GT flow2 from HDF5 sidecars and reports EPE/PSNR/SSIM.

Row inputs mirror the reference: degraded section %04d.png + its interp
image from the interp stage output dir. The FlowNetC/FlowNetS backbones the
reference scripts import do not exist in the repo (SURVEY §2.2) — selecting
them errors gracefully here with the same flag surface.
"""

import argparse
import os
import time

import numpy as np
from PIL import Image

import jax.numpy as jnp

from sstem_tpu import losses, metrics
from sstem_tpu.cli._ckpt import load_model_variables
from sstem_tpu.compat.config import load_sff_config
from sstem_tpu.infer.pipeline import SFFPipeline, _gray6, _to01
from sstem_tpu.infer.tiles import pad_to_multiple
from sstem_tpu.ops import spatial_transform
from sstem_tpu.ops.flow_display import dense_flow


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str,
                        default="sff_flowfusionnet_L1_lr0001decay")
    parser.add_argument("-id", "--model_id", type=str,
                        default="unfolding_fusionnet")
    parser.add_argument("-m", "--mode", type=str, default="valid")
    parser.add_argument("-ip", "--input_path", type=str,
                        default="../data/test/test_cremic/")
    parser.add_argument("-t", "--txt_file", type=str, default="cremic_25sff")
    parser.add_argument("-op", "--output_path", type=str,
                        default="../results/cremic")
    parser.add_argument("--interp-dir", type=str, default=None,
                        help="dir of interp-stage outputs (default "
                             "<op>/<txt>_interp)")
    parser.add_argument("--config-dir", type=str, default="./config")
    parser.add_argument("--ckpt", type=str, default=None)
    args = parser.parse_args(argv)

    if "flownet" in args.model_id.lower() and "fusionnet" not in args.model_id:
        raise SystemExit(
            "FlowNetC/FlowNetS backbones are referenced by the original "
            "scripts but their model files do not exist in the repo; only "
            "the FusionNet flow backbone is supported."
        )

    cfg = load_sff_config(args.cfg, args.config_dir)
    import jax

    from sstem_tpu.models import FusionNet

    flow_model = FusionNet(output_nc=2, ngf=cfg.TRAIN.ngf)
    ckpt = args.ckpt or os.path.join(
        "../trained_models", args.model_id, args.model_id + ".ckpt"
    )
    flow_vars = load_model_variables(ckpt, "fusionnet")
    flow_fn = jax.jit(lambda v, x: flow_model.apply(v, x, train=False))

    with open(os.path.join(args.input_path, args.txt_file + ".txt")) as f:
        img_list = [int(x) for x in f.read().split()]
    img_path = os.path.join(args.input_path, args.txt_file)
    interp_dir = args.interp_dir or os.path.join(
        args.output_path, args.txt_file + "_interp"
    )
    out_img = os.path.join(args.output_path,
                           args.txt_file + "_" + args.model_id)
    out_flow = out_img + "_flow"
    os.makedirs(out_img, exist_ok=True)
    os.makedirs(out_flow, exist_ok=True)

    total = {"epe": [], "psnr": [], "ssim": []}
    times = {"flow": [], "warp": []}
    with open(os.path.join(out_img, "scores.txt"), "w") as f_txt:
        for k in img_list:
            deg = np.asarray(Image.open(
                os.path.join(img_path, str(k).zfill(4) + ".png")))
            interp = np.asarray(Image.open(
                os.path.join(interp_dir, str(k).zfill(4) + ".png")))
            x = _gray6(_to01(deg[None]), _to01(interp[None]))
            x, (h, w) = pad_to_multiple(x, 16)
            t0 = time.time()
            flow = flow_fn(flow_vars, x)[:, :h, :w, :]
            flow.block_until_ready()
            t1 = time.time()
            warped = spatial_transform(
                _to01(deg[None, :, :, None]) , flow
            )[0, :, :, 0]
            warped = np.asarray(jnp.clip(warped, 0, 1))
            t2 = time.time()
            times["flow"].append(t1 - t0)
            times["warp"].append(t2 - t1)
            flow_np = np.asarray(flow[0])
            Image.fromarray((warped * 255).astype(np.uint8)).save(
                os.path.join(out_img, str(k).zfill(4) + ".png"))
            Image.fromarray(dense_flow(flow_np)).save(
                os.path.join(out_flow, str(k).zfill(4) + ".png"))

            if args.mode == "valid":
                import h5py

                hdf = os.path.join(img_path, str(k).zfill(4) + "_flow.hdf")
                with h5py.File(hdf, "r") as hf:
                    gt_flow = np.asarray(hf["flow2"])
                epe = float(losses.epe(jnp.asarray(flow_np[None]),
                                       jnp.asarray(gt_flow[None])))
                gt_img = np.asarray(Image.open(
                    os.path.join(img_path, str(k).zfill(4) + "_gt.png")))
                out = metrics.compute_psnr(
                    (warped * 255).astype(np.uint8), gt_img)
                psnr = 1e12 if not isinstance(out, tuple) else out[1]
                ssim = metrics.compute_ssim(
                    (warped * 255).astype(np.uint8), gt_img)
                total["epe"].append(epe)
                total["psnr"].append(psnr)
                total["ssim"].append(ssim)
                line = "image=%d, EPE=%.4f, PSNR=%.4f, SSIM=%.4f" % (
                    k, epe, psnr, ssim)
                print(line)
                f_txt.write(line + "\n")
        if args.mode == "valid" and total["epe"]:
            line = "mean_EPE=%.4f, mean_PSNR=%.4f, mean_SSIM=%.4f" % (
                np.mean(total["epe"]), np.mean(total["psnr"]),
                np.mean(total["ssim"]))
            print(line)
            f_txt.write(line)
    print("average flow time: %f" % np.mean(times["flow"]))
    print("average warp time: %f" % np.mean(times["warp"]))


if __name__ == "__main__":
    main()
