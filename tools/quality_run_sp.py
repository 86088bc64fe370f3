"""Self-trained SP (stain-precipitate) quality run -> SCORES_SP.md.

The SP analog of tools/quality_run.py (VERDICT r4 item 4): trains the SP
chain through the real CLIs — VFI interp (2-frame KPN), correction
(denoise U-Net), joint fusion — on SimuSP-degraded synthetic quartets,
then restores fresh degraded quartets with the test_sp_fusion CLI
composition and reports the reference's own SP metrics (cv2-dialect
calculate_psnr / calculate_ssim, sp_scripts_train/utils/util.py:134-186)
for degraded / vfi-only / fused outputs of sections 2 and 3.

Workload parity target: the SP quartet restore of
/root/reference/sp_scripts_test/test_fusion.py:17-141 (BASELINE config 3).

    python tools/quality_run_sp.py --root /tmp/sstem_quality_sp \
        --quartets 60 --iters-vfi 6000 --iters-denoise 3000 \
        --iters-fusion 3000
"""

import argparse
import glob
import json
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _latest_dir(root):
    subs = sorted(glob.glob(os.path.join(root, "*")))
    subs = [s for s in subs if os.path.isdir(s)]
    assert subs, root
    return subs[-1]


def _build_quartets(folder, n, size, bank, seed, start_stem=1):
    """Write n quartets (stem_1..4.png), degrade sections 2/3 with the SP
    simulator, interp placeholders, and the 12-column txt."""
    from PIL import Image

    from sstem_tpu.data.providers import write_sp_txt
    from sstem_tpu.data.sim_sp import simu_sp
    from sstem_tpu.data.synthetic import synth_stack

    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(seed)
    for q in range(n):
        stem = str(start_stem + q).zfill(4)
        stack = synth_stack(4, size, size, seed=seed * 100_000 + q)
        for j in range(4):
            Image.fromarray(stack[j]).save(
                os.path.join(folder, f"{stem}_{j + 1}.png"))
        for j in (2, 3):
            degra, maska, maskb = simu_sp(stack[j - 1], bank, rng,
                                          num_draws=200)
            Image.fromarray(degra).save(
                os.path.join(folder, f"{stem}_{j}_degra.png"))
            Image.fromarray(maska).save(
                os.path.join(folder, f"{stem}_{j}_degra_maska.png"))
            Image.fromarray(maskb).save(
                os.path.join(folder, f"{stem}_{j}_degra_maskb.png"))
            # interp placeholders (rows list them; unused with
            # if_use_vfiImg: False — dataset.py reads them only when set)
            Image.fromarray(stack[j - 1]).save(
                os.path.join(folder, f"{stem}_{j}_interp.png"))
    write_sp_txt(folder, n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/sstem_quality_sp")
    ap.add_argument("--quartets", type=int, default=60)
    ap.add_argument("--eval-quartets", type=int, default=4)
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("--eval-size", type=int, default=512)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--iters-vfi", type=int, default=6000)
    ap.add_argument("--iters-denoise", type=int, default=3000)
    ap.add_argument("--iters-fusion", type=int, default=3000)
    ap.add_argument("--bank-size", type=int, default=24)
    ap.add_argument("--out", default="SCORES_SP.md")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    import sstem_tpu.config as cfgmod
    from sstem_tpu.cli import (
        test_sp_fusion, train_sp_correction, train_sp_fusion,
        train_sp_interp,
    )
    from sstem_tpu.data.sim_sp import MaskBank

    cfgmod.set_matmul_precision("default")

    root = args.root
    data = os.path.join(root, "data")
    eval_data = os.path.join(root, "eval")
    models = os.path.join(root, "models")
    caches = os.path.join(root, "caches")
    os.makedirs(root, exist_ok=True)

    marker = os.path.join(root, "stage.json")
    stage = json.load(open(marker)) if os.path.exists(marker) else {}

    def done(key, value=True):
        stage[key] = value
        json.dump(stage, open(marker, "w"))

    bank = MaskBank.synthetic(n=args.bank_size, seed=5)

    if "data" not in stage:
        _build_quartets(data, args.quartets, args.img_size, bank, seed=11)
        done("data")
    if "eval_data" not in stage:
        _build_quartets(eval_data, args.eval_quartets, args.eval_size, bank,
                        seed=77)
        done("eval_data")

    def sp_cfg(name, extra):
        cfg = {
            "data_folder": data + "/",
            "data_txt": os.path.join(data, "sp_train_data.txt"),
            "mode": "a", "patch_size": args.patch, "if_rotate": True,
            "if_bdadjust": False, "if_use_vfiImg": False,
            "batch_size": args.batch, "kernel_size": 51,
            "base_lr": args.lr, "PAD": 0,
            "n_epochs": 1, "save_freq": 2000, "valid_freq": 500,
            "cache_path": caches, "save_path": models,
            "random_seed": 7, "cuda": False,
            **extra,
        }
        path = os.path.join(root, f"{name}.yaml")
        yaml.safe_dump(cfg, open(path, "w"))
        return path

    # 1) VFI (2-frame KPN; main_interp.py recipe)
    if "vfi_save" not in stage:
        train_sp_interp.main(["-opt", sp_cfg("sp_vfi", {}),
                              "--max-iters", str(args.iters_vfi)])
        done("vfi_save", _latest_dir(models))

    # 2) denoise U-Net (main_correction.py recipe)
    if "denoise_save" not in stage:
        train_sp_correction.main(["-opt", sp_cfg("sp_denoise", {}),
                                  "--max-iters", str(args.iters_denoise)])
        done("denoise_save", _latest_dir(models))

    # 3) joint fusion with frozen-ish pretrained branches (LR weights
    # 1e-20 / 1e-6 — main_fusion.py:65-77 semantics). _load_branch reads
    # model-%06d.ckpt from ONE resume dir, so stage the two pretrained
    # ckpts (distinct iters) into a shared dir via symlinks.
    if "fusion_save" not in stage:
        pre = os.path.join(root, "pretrained")
        os.makedirs(pre, exist_ok=True)
        for save, iters in ((stage["vfi_save"], args.iters_vfi),
                            (stage["denoise_save"], args.iters_denoise)):
            src = os.path.join(save, "model-%06d.ckpt" % iters)
            assert os.path.exists(src), src
            dst = os.path.join(pre, "model-%06d.ckpt" % iters)
            if not os.path.exists(dst):
                os.symlink(src, dst)
        assert args.iters_vfi != args.iters_denoise, (
            "vfi/denoise horizons must differ (shared pretrained dir "
            "keys branches by iter count)")
        cfg_f = sp_cfg("sp_fusion", {
            "if_pretrained": True, "resume_path": pre,
            "if_pretrained_vfi": True, "vfi_last_iter": args.iters_vfi,
            "if_pretrained_denoise": True,
            "denoise_last_iter": args.iters_denoise,
            "vfi_lr_weight": 1.0e-20, "denoise_lr_weight": 1.0e-6,
            "if_fusion_loss_only": False, "if_pretrained_fusion": False,
        })
        train_sp_fusion.main(["-opt", cfg_f,
                              "--max-iters", str(args.iters_fusion)])
        done("fusion_save", _latest_dir(models))

    # 4) restore the eval quartets through the test CLI composition and
    # score with the reference SP metrics
    from PIL import Image

    from sstem_tpu.metrics import calculate_psnr, calculate_ssim

    from sstem_tpu.cli import test_sp_interp

    rows = {k: {"psnr": [], "ssim": []}
            for k in ("degraded", "vfi", "fused")}
    for q in range(args.eval_quartets):
        stem = str(1 + q).zfill(4)
        out = os.path.join(root, "eval_out", stem)
        if not os.path.exists(os.path.join(out, "pred2.png")):
            test_sp_fusion.main([
                "-mp", stage["fusion_save"], "-dp", eval_data,
                "-im1", f"{stem}_1.png", "-im2d", f"{stem}_2_degra.png",
                "-im2m", f"{stem}_2_degra_maska.png",
                "-im3d", f"{stem}_3_degra.png",
                "-im3m", f"{stem}_3_degra_maska.png",
                "-im4", f"{stem}_4.png", "-sp", out,
            ])
        if not os.path.exists(os.path.join(out, "vfi_2.png")):
            test_sp_interp.main([
                "-mp", os.path.join(stage["fusion_save"], "vfi"),
                "-dp", eval_data, "-im1", f"{stem}_1.png",
                "-im2", f"{stem}_4.png", "-sp", out,
            ])
        for j, pred_name in ((2, "pred1.png"), (3, "pred2.png")):
            clean = np.asarray(Image.open(
                os.path.join(eval_data, f"{stem}_{j}.png")), np.float64)
            degra = np.asarray(Image.open(
                os.path.join(eval_data, f"{stem}_{j}_degra.png")),
                np.float64)
            fused = np.asarray(Image.open(
                os.path.join(out, pred_name)), np.float64)
            vfi = np.asarray(Image.open(
                os.path.join(out, f"vfi_{j - 1}.png")), np.float64)
            for key, img in (("degraded", degra), ("vfi", vfi),
                             ("fused", fused)):
                rows[key]["psnr"].append(calculate_psnr(img, clean))
                rows[key]["ssim"].append(calculate_ssim(img, clean))

    lines = [
        "# SCORES_SP — self-trained SP restoration quality",
        "",
        f"SP chain trained through the real CLIs (VFI {args.iters_vfi} /"
        f" denoise {args.iters_denoise} / joint fusion {args.iters_fusion}"
        f" iters, K=51, patch {args.patch}^2, batch {args.batch},"
        f" lr {args.lr:g}, LR weights vfi 1e-20 / denoise 1e-6) on"
        f" {args.quartets} SimuSP-degraded synthetic {args.img_size}^2"
        f" quartets; restoration of {args.eval_quartets} fresh"
        f" {args.eval_size}^2 quartets via the test_sp_fusion CLI"
        " (reference workload: sp_scripts_test/test_fusion.py:17-141)."
        " Metrics: the reference's own cv2-dialect calculate_psnr /"
        " calculate_ssim (sp_scripts_train/utils/util.py:134-186) over"
        " sections 2 and 3.",
        "",
        "| output | PSNR | SSIM |",
        "|---|---|---|",
    ]
    report = {}
    for key in ("degraded", "vfi", "fused"):
        p = float(np.mean(rows[key]["psnr"]))
        s = float(np.mean(rows[key]["ssim"]))
        report[key] = {"psnr": round(p, 3), "ssim": round(s, 4)}
        lines.append(f"| {key} | {p:.3f} | {s:.4f} |")
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(report))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
