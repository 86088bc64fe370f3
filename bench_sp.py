"""SP quartet restoration throughput per chip (BASELINE config 3).

The SP sibling of bench.py: for each degraded quartet of 1250x1250
sections — 2-frame KPN VFI from sections 1&4 (Pallas sepconv, K=51),
denoise U-Net on degraded sections 2&3, mask blend, FusionNet merge
(reference workload: sp_scripts_test/test_fusion.py:17-141) — all fused
in one jitted program per quartet batch, bf16 packed-conv serving.

One quartet produces TWO restored sections, so throughput counts
2 * 1250^2 output pixels per quartet (matching the reference's own
"processing" unit, test_fusion.py:141).

Baseline note: like bench.py's ``REFERENCE_GPU_MPS``, the denominator is
an analytic estimate of the PyTorch reference on its era GPU — the
reference publishes no numbers (BASELINE.md). It is pinned by a measured
CPU anchor: tools/reference_anchor_sp.py runs the ACTUAL reference SP
models (CUDA sepconv stubbed with the parity harness's faithful torch
implementation) on one 1280^2 quartet on this host's CPU; the SFF anchor
established a 174x GPU:CPU factor for this workload class (BASELINE.md
round-3 anchor note), and the same factor applied to the SP CPU rate
gives the default below. Override with SP_REFERENCE_GPU_MPS.

Prints ONE JSON line with the same discipline as bench.py (structured
error lines on tunnel failure; never a bare traceback).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Envelope: reference_anchor_sp.py measured mp_per_s_cpu x the SFF-anchor
# 174x GPU:CPU factor (see docstring). Re-derive whenever the anchor
# re-runs; committed anchor JSON lives in PERFORMANCE.md round-5.
SP_REFERENCE_GPU_MPS = float(os.environ.get("SP_REFERENCE_GPU_MPS", "2.0"))

# BENCH_SP_SMOKE=1: tiny CPU interpret-mode pass (no TPU, no timing claim)
# to validate the jit composition before hardware runs
SMOKE = os.environ.get("BENCH_SP_SMOKE", "0") == "1"
SECTION = 96 if SMOKE else 1250
N_QUARTETS = 2 if SMOKE else 6
BATCH = 1 if SMOKE else int(os.environ.get("BENCH_SP_BATCH", "2"))


def _emit_error(error, detail, rc=2):
    print(json.dumps({
        "metric": "sp_quartet_throughput",
        "value": None,
        "unit": "MP/s/chip",
        "vs_baseline": None,
        "error": error,
        "detail": detail,
    }))
    sys.exit(rc)


def _await_backend():
    retries = int(os.environ.get("BENCH_BACKEND_RETRIES", "4"))
    probe_timeout = int(os.environ.get("BENCH_BACKEND_PROBE_TIMEOUT", "300"))
    detail = "unknown"
    for attempt in range(retries):
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print('BACKEND_OK', len(d), d[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout)
            lines = p.stdout.strip().splitlines()
            if p.returncode == 0 and lines and lines[-1].startswith(
                    "BACKEND_OK"):
                return lines[-1]
            err = [l for l in p.stderr.strip().splitlines() if l.strip()]
            detail = err[-1] if err else f"probe rc={p.returncode}"
        except subprocess.TimeoutExpired:
            detail = f"backend probe timed out after {probe_timeout}s"
        if attempt < retries - 1:
            time.sleep(min(120, 15 * 2 ** attempt))
    _emit_error("tpu_unavailable", detail)


def main():
    if not SMOKE:
        _await_backend()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/sstem_tpu_jax_cache_cpu" if SMOKE else
                      "/tmp/sstem_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sstem_tpu.config as cfg
    from sstem_tpu.data.synthetic import synth_stack
    from sstem_tpu.models import FusionNetSP, IFNet, UNetSP

    cfg.set_matmul_precision("default")
    cfg.set_compute_dtype("bfloat16")

    key = jax.random.PRNGKey(0)
    x6 = jnp.zeros((1, 256, 256, 6), jnp.float32)
    x1 = jnp.zeros((1, 256, 256, 1), jnp.float32)
    vfi_vars = jax.jit(IFNet(51, n_frames=2).init)(key, x6)
    denoise_vars = jax.jit(
        lambda k, x: UNetSP(1).init(k, x, train=True))(key, x1)
    fusion_vars = jax.jit(
        lambda k, a, b: FusionNetSP(1).init(k, a, b, train=True)
    )(key, x1, x1)

    from sstem_tpu.infer.pipeline import _to01
    from sstem_tpu.infer.tiles import pad_to_multiple
    from sstem_tpu.models.serving import (
        fusionnet_sp_serve, ifnet_serve, unet_sp_serve)

    def quartet_restore(vv, dv, fv, img1, img4, deg2, deg3, m2, m3):
        # 2-channel gray pair: the replicated 6-channel glue never exists
        # (ifnet_serve pair-fold, exact)
        x = jnp.stack([_to01(img1), _to01(img4)], axis=-1)
        x, _ = pad_to_multiple(x, 32)
        vfi = jnp.clip(ifnet_serve(vv, x, n_frames=2,
                                   interpret=SMOKE), 0.0, 1.0)
        d2, _ = pad_to_multiple(_to01(deg2)[..., None], 32)
        d3, _ = pad_to_multiple(_to01(deg3)[..., None], 32)
        mm2, _ = pad_to_multiple(_to01(m2)[..., None], 32)
        mm3, _ = pad_to_multiple(_to01(m3)[..., None], 32)
        den2 = unet_sp_serve(dv, d2, interpret=SMOKE)
        den3 = unet_sp_serve(dv, d3, interpret=SMOKE)
        p1 = fusionnet_sp_serve(fv, vfi[..., 0:1] * (1 - mm2), den2 * mm2,
                                interpret=SMOKE)
        p2 = fusionnet_sp_serve(fv, vfi[..., 1:2] * (1 - mm3), den3 * mm3,
                                interpret=SMOKE)
        return jnp.sum(p1.astype(jnp.float32)) + jnp.sum(
            p2.astype(jnp.float32))

    def restore_batches(vv, dv, fv, st, masks, idx):
        # idx: (G, B) int32 quartet base ids into a (Q*4, H, W) stack;
        # vector gathers keep the (B, H, W) batch dim the serve fns expect
        def one_group(ixs):
            return quartet_restore(
                vv, dv, fv, st[ixs], st[ixs + 3], st[ixs + 1], st[ixs + 2],
                masks[ixs + 1], masks[ixs + 2])
        return jax.lax.map(one_group, idx)

    restore_jit = jax.jit(restore_batches)

    stack = synth_stack(N_QUARTETS * 4, SECTION, SECTION, seed=0)
    pad = -(-SECTION // 32) * 32 - SECTION
    stack_p = np.pad(stack, [(0, 0), (0, pad), (0, pad)], mode="edge")
    rng = np.random.default_rng(3)
    masks = (rng.random(stack_p.shape) > 0.8).astype(np.uint8) * 255
    dev_stack = jnp.asarray(stack_p)
    dev_masks = jnp.asarray(masks)

    base_ids = np.arange(N_QUARTETS, dtype=np.int32) * 4
    idx = base_ids.reshape(-1, BATCH)

    def run():
        out = restore_jit(vfi_vars, denoise_vars, fusion_vars, dev_stack,
                          dev_masks, jnp.asarray(idx))
        return float(out.sum())

    run()
    run()
    run()
    dt = min(
        (lambda t0: (run(), time.time() - t0)[1])(time.time())
        for _ in range(3)
    )

    mpix = N_QUARTETS * 2 * SECTION * SECTION / 1e6
    mps = mpix / dt
    print(json.dumps({
        "metric": "sp_quartet_throughput",
        "value": round(mps, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / SP_REFERENCE_GPU_MPS, 3),
        "ms_per_quartet": round(dt / N_QUARTETS * 1e3, 1),
        "reference_gpu_mps_estimate": SP_REFERENCE_GPU_MPS,
        "config": {"quartets": N_QUARTETS, "batch": BATCH,
                   "dtype": "bfloat16", "packed_conv_serving": True},
    }))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:
        import traceback
        tail = traceback.format_exc().strip().splitlines()[-1]
        _emit_error("bench_sp_failed", f"{type(e).__name__}: {e} | {tail}",
                    rc=1)
