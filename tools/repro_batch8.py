"""Minimal repro + bisection for the batch-8 compile blowup (VERDICT r2/r3).

The fused per-section restore program (interp -> flow -> warp -> fusion ->
stitch, bench.py::section_restore) compiles fine at batch 4 and "blows up"
at batch 8 on this rig. That diagnosis has so far been folklore — one
observation, no breakdown. This tool measures AOT compile wall time
(jit(...).lower(shapes).compile()) per (batch, stage) cell, each in its own
subprocess with a hard timeout so a pathological compile becomes a data
point instead of a hang, and sweeps stage subsets to locate WHICH part of
the program the compile time is super-linear in:

    python tools/repro_batch8.py                 # full sweep, writes JSON
    python tools/repro_batch8.py --one full 8    # single cell, in-process

Stages: interp (IFNet packed serving + sepconv), restore (FusionNet + warp
+ UNetSFF), full (both + stitch), conv_only (restore minus warp),
interp_nosep (interp with the Pallas sepconv replaced by a 1x1 stub).
Results land in /tmp/repro_batch8.json and the PERFORMANCE.md discussion.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTION = 1250
STAGES = ("interp", "interp_nosep", "restore", "conv_only", "full")


def build_fn(stage):
    import jax
    import jax.numpy as jnp

    import sstem_tpu.config as cfg
    from sstem_tpu.infer.pipeline import _gray6, _to01
    from sstem_tpu.infer.tiles import pad_to_multiple
    from sstem_tpu.models import FusionNet, IFNet, UNetSFF
    from sstem_tpu.models.serving import (
        fusionnet_serve, ifnet_serve, unet_sff_serve)
    from sstem_tpu.ops import spatial_transform

    cfg.set_matmul_precision("default")
    cfg.set_compute_dtype("bfloat16")
    key = jax.random.PRNGKey(0)
    x6 = jnp.zeros((1, 256, 256, 6), jnp.float32)
    interp_vars = jax.jit(IFNet(51, 1).init)(key, x6)
    flow_model = FusionNet(output_nc=2)
    fusion_model = UNetSFF(1)
    flow_vars = jax.jit(lambda k, x: flow_model.init(k, x, train=True))(
        key, x6)
    fusion_vars = jax.jit(lambda k, x: fusion_model.init(k, x, train=True))(
        key, x6)

    def interp_stage(prev_img, next_img, use_sepconv=True):
        x = _gray6(_to01(prev_img), _to01(next_img))
        x, _ = pad_to_multiple(x, 32)
        if use_sepconv:
            out = ifnet_serve(interp_vars, x)[..., 0]
        else:
            # sepconv stubbed: mean of the two padded grays (keeps the
            # trunk + heads, drops the Pallas kernel from the program)
            out = ifnet_serve(interp_vars, x)[..., 0] * 0 + jnp.mean(
                x[..., 0:2], -1)
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)

    def restore_stage(degraded, interp, with_warp=True):
        x2 = jnp.concatenate(
            [_to01(degraded)[..., None],
             pad_to_multiple(interp[..., None], 32)[0]], axis=-1)
        flow = fusionnet_serve(flow_vars, x2).astype(jnp.float32)
        if with_warp:
            warped1 = spatial_transform(x2[..., 0:1], flow)
        else:
            warped1 = x2[..., 0:1] + jnp.mean(flow, -1, keepdims=True)
        fused2 = jnp.concatenate([warped1, x2[..., 1:2]], axis=-1)
        pred = unet_sff_serve(fusion_vars, fused2)
        return pred.astype(jnp.float32), warped1

    if stage == "interp":
        return lambda p, nx, d: jnp.sum(interp_stage(p, nx))
    if stage == "interp_nosep":
        return lambda p, nx, d: jnp.sum(interp_stage(p, nx,
                                                     use_sepconv=False))
    if stage == "restore":
        return lambda p, nx, d: jnp.sum(restore_stage(d, _to01(p))[0])
    if stage == "conv_only":
        return lambda p, nx, d: jnp.sum(
            restore_stage(d, _to01(p), with_warp=False)[0])

    def full(p, nx, d):
        interp = interp_stage(p, nx)
        pred, warped1 = restore_stage(d, interp)
        w8 = jnp.floor(jnp.clip(warped1[..., 0], 0, 1) * 255.0)
        m = (w8 >= 2).astype(jnp.float32)
        stitch = interp * 255.0 * (1 - m) + w8 * m
        return jnp.sum(pred) + jnp.sum(stitch)

    return full


def one_cell(stage, batch):
    import jax
    import jax.numpy as jnp

    # fresh cache dir per run so compile time is measured, not cache hits
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/repro_b8_cache_{stage}_{batch}")
    fn = build_fn(stage)
    # bench.py pads the whole stack to a 32-multiple before the fused
    # program; compile at the same padded shape
    padded = -(-SECTION // 32) * 32
    shape = jax.ShapeDtypeStruct((batch, padded, padded), jnp.float32)
    t0 = time.time()
    lowered = jax.jit(fn).lower(shape, shape, shape)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    stats = {}
    try:
        cm = compiled.cost_analysis()
        cm = cm[0] if isinstance(cm, list) else cm
        stats = {k: cm[k] for k in ("flops", "bytes accessed")
                 if cm and k in cm}
    except Exception:
        pass
    print(json.dumps({"stage": stage, "batch": batch,
                      "lower_s": round(t_lower, 2),
                      "compile_s": round(t_compile, 2), **stats}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", nargs=2, metavar=("STAGE", "BATCH"))
    ap.add_argument("--stages", nargs="*", default=list(STAGES))
    ap.add_argument("--batches", nargs="*", type=int, default=[1, 4, 6, 8])
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-cell compile timeout (s)")
    ap.add_argument("--out", default="/tmp/repro_batch8.json")
    args = ap.parse_args()

    if args.one:
        one_cell(args.one[0], int(args.one[1]))
        return 0

    results = []
    for stage in args.stages:
        for batch in args.batches:
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--one", stage, str(batch)],
                    capture_output=True, text=True, timeout=args.timeout)
                line = [l for l in p.stdout.splitlines()
                        if l.startswith("{")]
                if line:
                    rec = json.loads(line[-1])
                else:
                    import re
                    err = [l for l in p.stderr.strip().splitlines()
                           if re.match(r"\w+(Error|Exception|Interrupt)\b",
                                       l.strip())]
                    err = err or [l for l in p.stderr.strip().splitlines()
                                  if l.strip()]
                    rec = {"stage": stage, "batch": batch,
                           "error": (err[-1][:200] if err
                                     else f"rc={p.returncode}")}
            except subprocess.TimeoutExpired:
                rec = {"stage": stage, "batch": batch,
                       "error": f"compile timeout > {args.timeout}s",
                       "wall_s": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
            results.append(rec)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
