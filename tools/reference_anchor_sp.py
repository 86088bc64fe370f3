"""Measured reference-on-CPU anchor for bench_sp's vs_baseline chain.

The SP analog of tools/reference_anchor.py: runs the ACTUAL reference SP
quartet pipeline (sp_scripts_test/test_fusion.py:17-141 semantics — VFI
2-frame KPN on sections 1&4, denoise U-Net on degraded 2&3, mask blend,
FusionNet merge) on one 1280^2 quartet on the host CPU, with the CUDA-only
sepconv stubbed by the parity harness's faithful brute-force torch
implementation. One quartet restores TWO sections, so the output-pixel
rate is 2*hw^2/total.

The committed number pins the CPU end of bench_sp.py's
``SP_REFERENCE_GPU_MPS`` envelope via the same GPU:CPU factor the SFF
anchor established (1.6 MP/s GPU estimate / 0.0092 MP/s measured CPU =
~174x; BASELINE.md round-3 anchor note).
"""

import importlib.util
import json
import os
import sys
import time

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

    nets = helpers._import_ref("sp_scripts_train", "networks")

    hw = 1280
    torch.manual_seed(0)
    vfi = nets.IFNet(kernel_size=51).eval()
    denoise = nets.UNet(1, 1).eval()
    fusion = nets.FusionNet(1, 1).eval()

    img1 = torch.rand(1, 1, hw, hw)
    img4 = torch.rand(1, 1, hw, hw)
    deg2 = torch.rand(1, 1, hw, hw)
    deg3 = torch.rand(1, 1, hw, hw)
    m2 = (torch.rand(1, 1, hw, hw) > 0.8).float()
    m3 = (torch.rand(1, 1, hw, hw) > 0.8).float()

    def timed(fn, reps=1):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.time()
            with torch.no_grad():
                out = fn()
            best = min(best, time.time() - t0)
        return best, out

    # test_fusion.py: inputs_vfi = cat(img1 x3, img4 x3); ONE forward
    # yields both frames (networks.py:120-129)
    x6 = torch.cat([img1.repeat(1, 3, 1, 1), img4.repeat(1, 3, 1, 1)], 1)
    t_vfi, vfi_pred = timed(lambda: vfi(x6))
    print(f"vfi(2-frame kpn): {t_vfi:.2f} s", flush=True)

    t_den, dens = timed(lambda: (denoise(deg2), denoise(deg3)), reps=2)
    print(f"denoise x2: {t_den:.2f} s", flush=True)

    den2, den3 = dens

    def fuse():
        p1 = fusion(vfi_pred[:, 0:1] * (1 - m2), den2 * m2)
        p2 = fusion(vfi_pred[:, 1:2] * (1 - m3), den3 * m3)
        return p1, p2

    t_fus, _ = timed(fuse, reps=2)
    print(f"fusion x2: {t_fus:.2f} s", flush=True)

    total = t_vfi + t_den + t_fus
    mps = 2 * hw * hw / total / 1e6
    print(json.dumps({
        "metric": "reference_sp_quartet_cpu_anchor",
        "section": hw,
        "stage_s": {"vfi_ifnet_sepconv": round(t_vfi, 2),
                    "denoise_x2": round(t_den, 2),
                    "fusion_x2": round(t_fus, 2)},
        "total_s_per_quartet": round(total, 2),
        "mp_per_s_cpu": round(mps, 4),
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
