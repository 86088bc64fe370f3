"""Compare the f32 and bf16 activation paths of the full SFF pipeline.

Usage:
    python tools/quality_check.py --interp CKPT --flow CKPT --fusion CKPT \
        [--stack DIR_OF_PNGS]

Reports max gray-level delta and PSNR between the two paths per output.
With randomly initialized weights the delta is meaningless (untrained KPN
taps amplify rounding); run with trained checkpoints before enabling
``set_compute_dtype('bfloat16')`` for serving (budget: <= 0.1 dB on the
restoration metrics, BASELINE.md).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import sstem_tpu.config as cfg
    from sstem_tpu.cli._ckpt import load_model_variables
    from sstem_tpu.data.synthetic import synth_stack
    from sstem_tpu.infer.pipeline import SFFPipeline

    parser = argparse.ArgumentParser()
    parser.add_argument("--interp", default=None)
    parser.add_argument("--flow", default=None)
    parser.add_argument("--fusion", default=None)
    parser.add_argument("--size", type=int, default=512)
    args = parser.parse_args()

    cfg.set_matmul_precision("default")
    key = jax.random.PRNGKey(0)
    x6 = jnp.zeros((1, 256, 256, 6), jnp.float32)

    if args.interp:
        iv = load_model_variables(args.interp, "ifnet_sff")
    else:
        from sstem_tpu.models import IFNet

        iv = jax.jit(IFNet(51, 1).init)(key, x6)
        print("WARNING: random interp weights — deltas are not meaningful")
    if args.flow:
        fv = load_model_variables(args.flow, "fusionnet")
    else:
        from sstem_tpu.models import FusionNet

        fv = jax.jit(lambda k, x: FusionNet(output_nc=2).init(
            k, x, train=True))(key, x6)
    if args.fusion:
        uv = load_model_variables(args.fusion, "unet_sff")
    else:
        from sstem_tpu.models import UNetSFF

        uv = jax.jit(lambda k, x: UNetSFF(1).init(k, x, train=True))(key, x6)

    stack = synth_stack(3, args.size, args.size, seed=0)
    outs = {}
    for mode in (None, "bfloat16"):
        cfg.set_compute_dtype(mode)
        pipe = SFFPipeline(interp_vars=iv, flow_vars=fv, fusion_vars=uv)
        outs[mode] = pipe.restore_stack(stack, [1], chunk=1)
    cfg.set_compute_dtype(None)

    for k2 in ("interp", "fused", "stitch"):
        a = outs[None][1][k2].astype(np.float64)
        b = outs["bfloat16"][1][k2].astype(np.float64)
        mse = np.mean((a - b) ** 2)
        psnr = 99.0 if mse < 1e-9 else 20 * np.log10(255 / np.sqrt(mse))
        print("%s: max|d|=%.1f gray, PSNR(f32 vs bf16)=%.1f dB"
              % (k2, np.abs(a - b).max(), psnr))


if __name__ == "__main__":
    main()
