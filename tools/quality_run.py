"""Self-trained quality run -> SCORES.md (VERDICT r1 items 4 and 7).

Trains the full SFF chain (interp KPN K=51 -> unfolding flow -> fusion
U-Net, reference configs/losses) on synthetic CREMI-like data through the
real CLIs, then restores a degraded synthetic stack with the fused pipeline
and reports reference-exact PSNR/SSIM for every stage output, in both f32
and bf16 serving (the bf16 budget is <= 0.1 dB, BASELINE.md).

    python tools/quality_run.py --root /tmp/sstem_quality --iters 1500

The reference never shipped quantitative results (SURVEY §6); this run
produces the numbers its machinery would have measured
(sff_scripts_fusion/inference.py:174-192 semantics).
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
    assert subs, root
    return subs[-1]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/sstem_quality")
    parser.add_argument("--iters", type=int, default=1500)
    parser.add_argument("--iters-unfold", type=int, default=None)
    parser.add_argument("--iters-fusion", type=int, default=None)
    parser.add_argument("--device-datagen", action="store_true",
                        help="unfolding/fusion degradation inside the "
                             "jitted step (TPU-rate long runs)")
    parser.add_argument("--triplets", type=int, default=120)
    parser.add_argument("--img-size", type=int, default=384)
    parser.add_argument("--patch", type=int, default=256)
    parser.add_argument("--batch", type=int, default=4)
    # unfolding/fusion recipe: the reference trains these at base_lr 1e-4,
    # batch 32 (sff_flowfusionnet_L1_lr0001decay.yaml /
    # sff_fusion_L1_lr0001decay.yaml). Round 4's chain ran them at
    # 1e-3 / batch 4 and the flow net plateaued at ~13 px EPE
    # (tools/diagnose_fusion.py) — the fused<interp gap traced to that.
    parser.add_argument("--batch-correction", type=int, default=16)
    parser.add_argument("--lr-correction", type=float, default=1e-4)
    # The fusion U-Net is NOT lr-fragile the way the flow net is: the r4
    # chain's U-Net at lr 1e-3 learned warped-channel passthrough (24.81 dB
    # off-strip on the GT-flow probe) in 24k iters where the reference-lr
    # (1e-4) v2 U-Net reached only 21.82 in 16k (DIAGNOSIS.md). Default
    # None = follow --lr-correction (the reference recipe).
    parser.add_argument("--lr-fusion", type=float, default=None)
    parser.add_argument("--stack-size", type=int, default=768)
    parser.add_argument("--resume", action="store_true",
                        help="continue the fusion stage from a prior "
                             "*_q_fusion dir's checkpoints (same config "
                             "and flow net only — not verified)")
    parser.add_argument("--out", default="SCORES.md")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    import sstem_tpu.config as cfgmod
    from sstem_tpu.cli import (
        infer_interp_trainingset, train_fusion, train_interp,
        train_unfolding,
    )
    from sstem_tpu.data.synthetic import synth_stack, write_triplet_tree

    cfgmod.set_matmul_precision("default")

    root = args.root
    data = os.path.join(root, "data")
    caches = os.path.join(root, "caches")
    models = os.path.join(root, "models")
    os.makedirs(root, exist_ok=True)
    if not os.path.exists(os.path.join(data, "train_data.txt")):
        write_triplet_tree(data, n_triplets=args.triplets,
                           size=args.img_size, seed=7)

    base_aug = {
        "random_fliplr": True, "random_flipud": True, "random_flipz": True,
        "random_rotation": True, "swap": False, "color_jitter": False,
        "COLOR": {"brightness": 0.2, "contrast": 0.2, "saturation": 0.2},
        "elastic_trans": False,
        "ELASTIC": {"alpha_range": 100, "sigma": 10, "shave": 20},
        "gauss_noise": False, "GAUSS": {"gauss_mean": 0,
                                        "gauss_sigma": 0.001},
    }

    def write_cfg(name, train_extra, data_extra):
        cfg = {
            "NAME": name,
            "TRAIN": {
                "resume": False, "if_valid": False,
                "cache_path": caches, "save_path": models,
                "input_nc": 6, "output_nc": 1, "ngf": 32, "pad": 0,
                "loss": "L1", "kernel_size": 51,
                "total_iters": args.iters, "warmup_iters": 50,
                "base_lr": 1e-3, "end_lr": 1e-5,
                "display_freq": 200, "valid_freq": args.iters,
                "save_freq": args.iters,
                "decay_iters": args.iters, "weight_decay": None,
                "power": 1.5, "batch_size": args.batch, "num_workers": 2,
                "is_cuda": False, "random_seed": 7,
                **train_extra,
            },
            "DATA": {
                "folder_name": data, "train_txt": "train_data.txt",
                "patch_size": [args.patch, args.patch], "AUG": base_aug,
                **data_extra,
            },
            "TEST": {"pad": 0},
        }
        path = os.path.join(root, f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        return path

    marker = os.path.join(root, "stage.json")
    stage = {}
    if os.path.exists(marker):
        stage = json.load(open(marker))

    def done(key, value=True):
        stage[key] = value
        json.dump(stage, open(marker, "w"))

    # 1) interp trainer
    if "interp_save" not in stage:
        cfg_i = write_cfg("q_interp", {}, {})
        iargs = ["-c", cfg_i, "--max-iters", str(args.iters)]
        if args.device_datagen:
            iargs.append("--device-datagen")
        train_interp.main(iargs)
        done("interp_save", _latest_dir(models))
        done("cfg_i", cfg_i)
    cfg_i = stage["cfg_i"]

    # 2) interp over the training set
    if not stage.get("interp_ts"):
        infer_interp_trainingset.main(
            ["-c", cfg_i, "--ckpt", stage["interp_save"], "-bs", "4"])
        done("interp_ts")

    # 3) unfolding trainer (on-the-fly degradation)
    if "unfold_save" not in stage:
        it_u = args.iters_unfold or args.iters
        cfg_u = write_cfg(
            "q_unfold",
            {"output_nc": 2, "total_iters": it_u, "decay_iters": it_u,
             "valid_freq": it_u, "save_freq": min(8000, it_u),
             "base_lr": args.lr_correction,
             "batch_size": args.batch_correction},
            {"patch_size": [args.img_size, args.img_size],
             "det_size": args.patch,
             "interp_train_txt": "interp_train_data.txt",
             "gt_line": False},
        )
        uargs = ["-c", cfg_u, "--max-iters",
                 str(args.iters_unfold or args.iters)]
        if args.device_datagen:
            uargs.append("--device-datagen")
        train_unfolding.main(uargs)
        done("unfold_save", _latest_dir(models))

    # 4) fusion trainer with frozen flow
    if "fusion_save" not in stage:
        flow_ckpts = glob.glob(
            os.path.join(stage["unfold_save"], "model-*.ckpt"))
        it_f = args.iters_fusion or args.iters
        cfg_f = write_cfg(
            "q_fusion",
            {"output_nc": 1, "total_iters": it_f, "decay_iters": it_f,
             # periodic saves: a long fusion horizon interrupted by a rig
             # outage (or a session deadline) still leaves an evaluable
             # checkpoint at the last 4k boundary
             "valid_freq": it_f, "save_freq": min(4000, it_f),
             "base_lr": (args.lr_fusion if args.lr_fusion is not None
                         else args.lr_correction),
             "batch_size": args.batch_correction,
             "flownet_path": stage["unfold_save"],
             "flownet_id": os.path.basename(sorted(flow_ckpts)[-1])},
            {"patch_size": [args.img_size, args.img_size],
             "det_size": args.patch,
             "interp_train_txt": "interp_train_data.txt",
             "gt_line": False},
        )
        fargs = ["-c", cfg_f, "--max-iters",
                 str(args.iters_fusion or args.iters)]
        if args.device_datagen:
            fargs.append("--device-datagen")
        # An interrupted fusion stage leaves 4k-boundary checkpoints in a
        # previous timestamped save dir; --resume opts in to continuing
        # from the newest one. Off by default: auto-resuming across a
        # config change or a retrained flow net would contaminate the
        # SCORES claim (ADVICE r4).
        if args.resume:
            prior = [d for d in sorted(glob.glob(
                os.path.join(models, "*_q_fusion")))
                if glob.glob(os.path.join(d, "model-*.ckpt"))]
            if prior:
                fargs += ["--resume-from", prior[-1]]
                print(f"resuming fusion stage from {prior[-1]}", flush=True)
        train_fusion.main(fargs)
        done("fusion_save", _latest_dir(models))

    # 5) degrade a fresh synthetic stack and restore it, f32 and bf16
    from sstem_tpu.cli._ckpt import load_model_variables
    from sstem_tpu.data.sim_sff import degrade_sff
    from sstem_tpu.infer.pipeline import SFFPipeline
    from sstem_tpu.metrics import compute_psnr, compute_ssim

    hw = args.stack_size
    clean = synth_stack(9, hw, hw, seed=99)
    rng = np.random.default_rng(13)
    damaged_ids = [2, 4, 6]
    degraded = clean.copy()
    for i in damaged_ids:
        out = degrade_sff(clean[i], rng, det_size=hw)
        degraded[i] = np.asarray(out["degraded"], np.uint8)

    iv = load_model_variables(stage["interp_save"], "ifnet_sff")
    fvv = load_model_variables(stage["unfold_save"], "fusionnet")
    uvv = load_model_variables(stage["fusion_save"], "unet_sff")

    results = {}
    for mode in ("float32", "bfloat16"):
        cfgmod.set_compute_dtype(None if mode == "float32" else "bfloat16")
        pipe = SFFPipeline(interp_vars=iv, flow_vars=fvv, fusion_vars=uvv,
                           kernel_size=51, ngf=32,
                           packed_conv=(mode == "bfloat16"
                                        and jax.default_backend() == "tpu"))
        res = pipe.restore_stack(degraded, damaged_ids, chunk=len(damaged_ids))
        rows = {}
        for key in ("interp", "fused", "stitch"):
            ps, ss = [], []
            for i in damaged_ids:
                pred = res[i][key].astype(np.float64)
                gt = clean[i].astype(np.float64)
                p = compute_psnr(gt, pred)
                p = p[1] if isinstance(p, tuple) else p
                ps.append(p)
                ss.append(compute_ssim(gt, pred))
            rows[key] = (float(np.mean(ps)), float(np.mean(ss)))
        # degraded-vs-clean baseline
        ps = [compute_psnr(clean[i].astype(np.float64),
                           degraded[i].astype(np.float64)) for i in
              damaged_ids]
        ps = [p[1] if isinstance(p, tuple) else p for p in ps]
        ss = [compute_ssim(clean[i].astype(np.float64),
                           degraded[i].astype(np.float64)) for i in
              damaged_ids]
        rows["degraded(baseline)"] = (float(np.mean(ps)), float(np.mean(ss)))
        results[mode] = rows
        print(mode, rows, flush=True)
    cfgmod.set_compute_dtype(None)

    lines = [
        "# SCORES — self-trained synthetic SFF restoration quality",
        "",
        f"Full chain trained through the real CLIs (interp {args.iters} /"
        f" unfolding {args.iters_unfold or args.iters} /"
        f" fusion {args.iters_fusion or args.iters} iters"
        f"{', device-datagen' if args.device_datagen else ''},"
        f" K=51, ngf=32, patch {args.patch}^2, batch {args.batch};"
        f" unfolding at the reference recipe lr"
        f" {args.lr_correction:g}, fusion at lr"
        f" {(args.lr_fusion if args.lr_fusion is not None else args.lr_correction):g},"
        f" batch {args.batch_correction})"
        f" on {args.triplets} synthetic {args.img_size}^2 triplets;"
        f" restoration of 3 SimuSFF-degraded {hw}^2 sections of a fresh"
        " synthetic stack. Metrics: reference-exact compute_psnr /"
        " MATLAB-style compute_ssim (sstem_tpu/metrics.py; semantics of"
        " sff_scripts_fusion/inference.py:174-192). The reference repo"
        " publishes no quantitative numbers (SURVEY §6) — these are the"
        " numbers its machinery would print, produced by this framework"
        " end-to-end.",
        "",
        "| output | f32 PSNR | f32 SSIM | bf16-packed PSNR | bf16-packed"
        " SSIM | delta dB |",
        "|---|---|---|---|---|---|",
    ]
    for key in ("degraded(baseline)", "interp", "fused", "stitch"):
        f32 = results["float32"][key]
        b16 = results["bfloat16"][key]
        lines.append(
            f"| {key} | {f32[0]:.3f} | {f32[1]:.4f} | {b16[0]:.3f} |"
            f" {b16[1]:.4f} | {b16[0] - f32[0]:+.3f} |")
    worst = min(results["bfloat16"][k][0] - results["float32"][k][0]
                for k in ("interp", "fused", "stitch"))
    lines += [
        "",
        f"Worst bf16-serving PSNR delta: {worst:+.3f} dB"
        f" (budget: >= -0.1 dB). The bf16 column also exercises the packed"
        " Pallas conv/deconv/pool serving path (models/serving.py), so"
        " this doubles as its end-to-end quality gate.",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}; worst bf16 delta {worst:+.3f} dB", flush=True)


if __name__ == "__main__":
    main()
