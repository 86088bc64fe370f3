"""Measured reference-on-CPU anchor for the bench's vs_baseline chain.

BENCH's ``REFERENCE_GPU_MPS = 1.6`` is an analytic envelope of the PyTorch
reference's per-chip throughput on its era GPU (bench.py docstring). A GPU
is not available here, but the reference models themselves run on the host
CPU (the same harness the parity tests use: the CUDA-only sepconv is
stubbed with a faithful brute-force torch implementation,
tests/test_reference_parity.py). Measuring the ACTUAL reference pipeline on
CPU pins one end of the envelope with a real number:

    full chain (interp IFNet+sepconv -> FusionNet flow -> warp -> UNet) on
    one 1280^2 section, reference semantics
    (sff_scripts_fusion/inference.py:125-171).

The committed result goes into BASELINE.md's anchor note next to the
envelope arithmetic.
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_parity_helpers():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "test_reference_parity.py")
    spec = importlib.util.spec_from_file_location("ref_parity_helpers", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import torch

    torch.set_num_threads(os.cpu_count() or 4)
    helpers = _load_parity_helpers()
    helpers._install_import_stubs()
    helpers._install_sepconv_stub()

    interp_mod = helpers._import_ref("sff_scripts_interp", "model_interp")
    flow_mod = helpers._import_ref("sff_scripts_unfolding",
                                   "model_fusionnet")
    unet_mod = helpers._import_ref("sff_scripts_fusion", "model_unet")
    warp_spec = importlib.util.spec_from_file_location(
        "ref_image_warp_torch",
        "/root/reference/sff_scripts_unfolding/utils/image_warp_torch.py")
    warp_mod = importlib.util.module_from_spec(warp_spec)
    warp_spec.loader.exec_module(warp_mod)

    hw = 1280
    torch.manual_seed(0)
    ifnet = interp_mod.IFNet(kernel_size=51).eval()
    flownet = flow_mod.FusionNet(input_nc=6, output_nc=2, ngf=32).eval()
    unet = unet_mod.UNet(6, 1).eval()
    stn = warp_mod.SpatialTransformation()

    x6 = torch.rand(1, 6, hw, hw)

    def timed(fn, reps=1):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            with torch.no_grad():
                out = fn()
            best = min(best, time.time() - t0)
        return best, out

    t_interp, interp = timed(lambda: ifnet(x6))
    print(f"interp(ifnet+sepconv): {t_interp:.2f} s", flush=True)
    t_flow, flow = timed(lambda: flownet(x6), reps=2)
    print(f"flow(fusionnet): {t_flow:.2f} s", flush=True)
    # reference call shape: forward(moving NCHW, deformation NHWC)
    # (image_warp_torch.py:97-101; usage sff_scripts_fusion/inference.py:150)
    t_warp, warped = timed(
        lambda: stn(x6[:, 0:3], flow.permute(0, 2, 3, 1)), reps=2)
    print(f"warp: {t_warp:.2f} s  out {tuple(warped.shape)}", flush=True)
    x6f = x6.clone()
    if warped.shape[1] != 3:  # NHWC return variant
        warped = warped.permute(0, 3, 1, 2)
    x6f[:, 0:3] = warped
    t_unet, _ = timed(lambda: unet(x6f), reps=2)
    print(f"fusion(unet): {t_unet:.2f} s", flush=True)

    total = t_interp + t_flow + t_warp + t_unet
    mps = hw * hw / total / 1e6
    print(json.dumps({
        "metric": "reference_pipeline_cpu_anchor",
        "section": hw,
        "stage_s": {"interp_ifnet_sepconv": round(t_interp, 2),
                    "flow": round(t_flow, 2), "warp": round(t_warp, 2),
                    "fusion_unet": round(t_unet, 2)},
        "total_s_per_section": round(total, 2),
        "mp_per_s_cpu": round(mps, 4),
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
