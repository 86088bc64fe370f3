"""Diagnose WHERE the fused stage loses PSNR vs interp (VERDICT r4 item 1).

The 24k-iter quality chain still scored fused 0.41 dB BELOW interp
(SCORES.md). This tool localizes the loss on the exact SCORES eval stack:

* region-split PSNR — inside the fold strip (where the tissue is destroyed
  and interp is the only information source) vs off-strip (where the
  unfolding warp recovers the REAL displaced tissue and fused should win);
* flow quality — EPE of the predicted unfolding flow vs the GT flow2 the
  degradation synthesized (sff_scripts_unfolding/utils/flow_synthesis.py
  semantics);
* oracle ablations — the same fusion U-Net fed with (a) a GT-flow2 warp
  (how much PSNR the flow net's error costs) and (b) a batch-stats flow
  prediction (the recipe skew: cli/train_fusion.py trained the U-Net
  against batch-stats flow while serving uses eval-mode flow — the
  reference freezes the flow net in eval mode BOTH places,
  sff_scripts_fusion/main_fusion.py:189);
* per-checkpoint curve — fused PSNR at every 4k-boundary fusion checkpoint
  (convergence vs recipe question).

Usage:
    python tools/diagnose_fusion.py --root /tmp/sstem_quality --out DIAG.json
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr01(gt, pred, region=None):
    """PSNR on 0..255 uint8-scale arrays, reference normalization (/255,
    PIXEL_MAX=1 — psnr_ssim.py:7-20), optionally masked to a region."""
    d = (np.asarray(gt, np.float64) - np.asarray(pred, np.float64)) / 255.0
    if region is not None:
        region = np.asarray(region, bool)
        if not region.any():
            return float("nan")
        d = d[region]
    mse = float(np.mean(d * d))
    if mse < 1e-10:
        return 1e12
    return float(10.0 * np.log10(1.0 / mse))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/sstem_quality")
    ap.add_argument("--stack-size", type=int, default=768)
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-curve", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    from sstem_tpu.cli._ckpt import load_model_variables
    from sstem_tpu.data.sim_sff import degrade_sff
    from sstem_tpu.data.synthetic import synth_stack
    from sstem_tpu.infer.pipeline import SFFPipeline
    from sstem_tpu.models import FusionNet, UNetSFF
    from sstem_tpu.ops import spatial_transform

    stage = json.load(open(os.path.join(args.root, "stage.json")))

    # --- eval data: EXACTLY the SCORES stack (quality_run.py step 5) -----
    hw = args.stack_size
    clean = synth_stack(9, hw, hw, seed=99)
    rng = np.random.default_rng(13)
    damaged_ids = [2, 4, 6]
    degraded = clean.copy()
    gt = {}
    for i in damaged_ids:
        out = degrade_sff(clean[i], rng, det_size=hw)
        degraded[i] = np.asarray(out["degraded"], np.uint8)
        gt[i] = out  # flow2 (GT unfolding flow), mask (0 = fold strip)

    iv = load_model_variables(stage["interp_save"], "ifnet_sff")
    fvv = load_model_variables(stage["unfold_save"], "fusionnet")
    uvv = load_model_variables(stage["fusion_save"], "unet_sff")

    flow_model = FusionNet(output_nc=2, ngf=32)
    unet = UNetSFF(out_channel=1)
    pipe = SFFPipeline(interp_vars=iv, flow_vars=fvv, fusion_vars=uvv,
                       kernel_size=51, ngf=32, packed_conv=False)

    def gray6(a, b):
        return jnp.concatenate([jnp.repeat(a[..., None], 3, -1),
                                jnp.repeat(b[..., None], 3, -1)], -1)

    @jax.jit
    def flows_fn(fv, x):
        ev = flow_model.apply(fv, x, train=False)
        bs, _ = flow_model.apply(fv, x, train=True, mutable=["batch_stats"])
        return ev, bs

    @jax.jit
    def fuse_fn(uv, warped1, interp1):
        fused_in = jnp.concatenate([jnp.repeat(warped1, 3, -1),
                                    jnp.repeat(interp1, 3, -1)], -1)
        return unet.apply(uv, fused_in, train=False)

    # --- per-section stage tensors ---------------------------------------
    prev = np.stack([degraded[i - 1] for i in damaged_ids])
    nxt = np.stack([degraded[i + 1] for i in damaged_ids])
    deg = np.stack([degraded[i] for i in damaged_ids]).astype(np.float32)
    interp = np.asarray(pipe.interpolate(prev, nxt))  # (3, H, W) in 0..1

    x6 = gray6(jnp.asarray(deg / 255.0), jnp.asarray(interp))
    flow_ev, flow_bs = flows_fn(fvv, x6)
    flow_gt = jnp.stack([jnp.asarray(gt[i]["flow2"]) for i in damaged_ids])

    def warp1(flow):
        return spatial_transform(x6[..., 0:1], flow)

    outs = {}
    for name, flow in (("evalflow", flow_ev), ("bsflow", flow_bs),
                       ("gtflow", flow_gt)):
        warped = warp1(flow)
        fused = fuse_fn(uvv, warped, jnp.asarray(interp)[..., None])
        outs[name] = dict(
            warped=np.asarray(jnp.clip(warped[..., 0], 0, 1)) * 255.0,
            fused=np.asarray(jnp.clip(fused[..., 0], 0, 1)) * 255.0,
        )

    # unknown region in RESTORED coords: the fold strip (mask==0) carried
    # through the GT unfolding warp; everything else the warp can recover
    unknown = []
    for k, i in enumerate(damaged_ids):
        m = np.asarray(spatial_transform(
            jnp.asarray(gt[i]["mask"], jnp.float32)[None, ..., None],
            flow_gt[k:k + 1])[0, ..., 0])
        unknown.append(m < 0.5)
    unknown = np.stack(unknown)

    epe = {}
    for name, flow in (("evalflow", flow_ev), ("bsflow", flow_bs)):
        e = np.linalg.norm(np.asarray(flow) - np.asarray(flow_gt), axis=-1)
        epe[name] = dict(
            overall=float(e.mean()),
            on_strip=float(e[unknown].mean()),
            off_strip=float(e[~unknown].mean()),
        )

    gtc = np.stack([clean[i] for i in damaged_ids]).astype(np.float64)
    rows = {}

    def add(name, img255):
        rows[name] = dict(
            overall=psnr01(gtc, img255),
            on_strip=psnr01(gtc, img255, unknown),
            off_strip=psnr01(gtc, img255, ~unknown),
        )

    add("degraded", deg)
    add("interp", interp * 255.0)
    for name in ("evalflow", "bsflow", "gtflow"):
        add(f"warped[{name}]", outs[name]["warped"])
        add(f"fused[{name}]", outs[name]["fused"])
    rows["strip_fraction"] = float(unknown.mean())

    report = {"psnr": rows, "epe": epe, "root": args.root}

    # --- fused PSNR vs fusion iters (all 4k-boundary checkpoints) --------
    if not args.no_curve:
        curve = []
        models_root = os.path.dirname(stage["fusion_save"])
        for d in sorted(glob.glob(os.path.join(models_root, "*_q_fusion"))):
            for ck in sorted(glob.glob(os.path.join(d, "model-*.ckpt"))):
                step = int(os.path.basename(ck).split("-")[1].split(".")[0])
                uv = load_model_variables(ck, "unet_sff")
                fused = fuse_fn(uv, warp1(flow_ev),
                                jnp.asarray(interp)[..., None])
                img = np.asarray(jnp.clip(fused[..., 0], 0, 1)) * 255.0
                curve.append(dict(dir=os.path.basename(d), iters=step,
                                  fused_psnr=psnr01(gtc, img),
                                  fused_on_strip=psnr01(gtc, img, unknown),
                                  fused_off_strip=psnr01(gtc, img, ~unknown)))
        report["curve"] = curve

        # flow EPE + off-strip warped PSNR vs unfolding iters (the
        # unfolding stage saves 8k-boundary checkpoints): localizes
        # WHEN the flow net becomes usable, per DIAGNOSIS.md finding 1
        curve_u = []
        models_root = os.path.dirname(stage["unfold_save"])
        for d in sorted(glob.glob(os.path.join(models_root, "*_q_unfold"))):
            for ck in sorted(glob.glob(os.path.join(d, "model-*.ckpt"))):
                step = int(os.path.basename(ck).split("-")[1].split(".")[0])
                fv = load_model_variables(ck, "fusionnet")
                fl, _ = flows_fn(fv, x6)
                e = np.linalg.norm(np.asarray(fl) - np.asarray(flow_gt),
                                   axis=-1)
                w = np.asarray(jnp.clip(warp1(fl)[..., 0], 0, 1)) * 255.0
                curve_u.append(dict(
                    dir=os.path.basename(d), iters=step,
                    epe=float(e.mean()),
                    epe_off_strip=float(e[~unknown].mean()),
                    warped_off_strip_psnr=psnr01(gtc, w, ~unknown)))
        report["curve_unfold"] = curve_u

    print(json.dumps(report, indent=1))
    if args.out:
        json.dump(report, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
