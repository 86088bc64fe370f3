"""End-to-end verify drive on the real TPU (see .claude/skills/verify).

Runs SFFPipeline.restore_stack on a synthetic stack at an odd section size
with both sepconv impls and cross-checks the uint8 outputs, then one jitted
TPU train step. Exits nonzero on mismatch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache")

    # Parity cross-checks run at f32 matmul precision: at the default
    # (bf16 MXU) precision, RANDOM-init K=51 kernel heads produce O(100)
    # pre-clip magnitudes, and ~1e-2 relative reassociation noise between
    # differently-fused programs flips clipped uint8 pixels wholesale —
    # that's numerics of untrained saturation, not a kernel bug (trained
    # weights hold <= 0.03 dB at bf16, SCORES.md).
    import sstem_tpu.config as _cfg
    _cfg.set_matmul_precision("highest")

    from sstem_tpu.data.synthetic import synth_stack
    from sstem_tpu.infer.pipeline import SFFPipeline
    from sstem_tpu.kernels.sepconv import set_sepconv_impl
    from sstem_tpu.models import FusionNet, IFNet, UNetSFF

    key = jax.random.PRNGKey(0)
    x6 = jnp.zeros((1, 64, 64, 6), jnp.float32)

    # Trained weights when available (meaningful outputs in [0, 1] make
    # the uint8 cross-checks strict); random init otherwise, where the
    # K=51 interp head saturates (pre-clip magnitudes O(100); any
    # reassociation between differently-factored/fused programs flips
    # clipped pixels) — the interp threshold is relaxed there and fused
    # (all-zero through the final ReLU at random init) is near-vacuous.
    ckpt_root = os.environ.get("VERIFY_CKPT_ROOT", "/tmp/sstem_quality")
    trained = False
    try:
        import glob as _glob
        import json as _json
        mark = _json.load(open(os.path.join(ckpt_root, "stage.json")))
        if all(k in mark for k in ("interp_save", "unfold_save",
                                   "fusion_save")):
            from sstem_tpu.cli._ckpt import load_model_variables
            iv = load_model_variables(mark["interp_save"], "ifnet_sff")
            fv = load_model_variables(mark["unfold_save"], "fusionnet")
            uv = load_model_variables(mark["fusion_save"], "unet_sff")
            trained = True
            print(f"using trained ckpts from {ckpt_root}", flush=True)
    except Exception as e:
        print(f"no trained ckpts ({type(e).__name__}); random init",
              flush=True)
    if not trained:
        iv = jax.jit(IFNet(51, 1).init)(key, x6)
        fv = jax.jit(lambda k, x: FusionNet(output_nc=2).init(
            k, x, train=True))(key, x6)
        uv = jax.jit(lambda k, x: UNetSFF(1).init(k, x, train=True))(key, x6)
    interp_tol = 1e-3 if trained else 5e-2

    stack = synth_stack(5, 251, 179, seed=0)
    outs = {}
    for impl in ("pallas", "xla"):
        set_sepconv_impl(impl)
        pipe = SFFPipeline(interp_vars=iv, flow_vars=fv, fusion_vars=uv)
        outs[impl] = pipe.restore_stack(stack, [1, 3])
    bad = 0
    for sid in (1, 3):
        for k in ("interp", "fused", "stitch"):
            a = outs["pallas"][sid][k].astype(np.int16)
            b = outs["xla"][sid][k].astype(np.int16)
            d = int(np.abs(a - b).max())
            frac = float((np.abs(a - b) > 1).mean())
            print(f"section {sid} {k}: max uint8 delta {d} "
                  f"(frac>1: {frac:.2e})", flush=True)
            if frac > (interp_tol if k == "interp" else 1e-3):
                bad += 1

    # scanned single-dispatch path vs per-group dispatch (odd tail group)
    set_sepconv_impl("pallas")
    pipe = SFFPipeline(interp_vars=iv, flow_vars=fv, fusion_vars=uv)
    ref = pipe.restore_stack(stack, [1, 2, 3], chunk=2)
    scn = pipe.restore_stack_scanned(stack, [1, 2, 3], chunk=2)
    for sid in (1, 2, 3):
        for k in ("interp", "fused", "warped", "stitch"):
            d = np.abs(scn[sid][k].astype(np.int16)
                       - ref[sid][k].astype(np.int16))
            frac = (d > 1).mean()
            if k == "stitch":
                # stitch = interp*(1-m)+warped*m with m = warped>=2
                # (inference.py:167-171): a +-1-level warped delta at the
                # threshold flips m and swaps interp<->warped wholesale.
                # Count only mismatches NOT explained by such a flip.
                ws = scn[sid]["warped"].astype(np.int16)
                wr = ref[sid]["warped"].astype(np.int16)
                flip = ((ws >= 2) != (wr >= 2)) & (np.abs(ws - wr) <= 2)
                frac = ((d > 1) & ~flip).mean()
                print(f"scanned vs loop section {sid} stitch: max delta "
                      f"{int(d.max())} (frac>1: {(d > 1).mean():.2e}, "
                      f"unexplained: {frac:.2e})", flush=True)
            else:
                print(f"scanned vs loop section {sid} {k}: max delta "
                      f"{int(d.max())} (frac>1: {frac:.2e})", flush=True)
            # interp: reassociation between the two programs flips
            # saturated pixels at random init; fused/stitch additionally
            # have the odd-size border-band regime (pipeline docstring)
            tol = interp_tol if k == "interp" else (
                1e-2 if trained else 2e-2)
            if frac > tol:
                bad += 1

    # SP pipeline: packed serving vs flax path on TPU
    from sstem_tpu.infer.pipeline import SPPipeline
    from sstem_tpu.models import FusionNetSP, UNetSP

    x1 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    vv = jax.jit(IFNet(51, 2).init)(key, x6)
    dv = jax.jit(lambda k, x: UNetSP(1).init(k, x, train=True))(key, x1)
    fvsp = jax.jit(lambda k, a, b: FusionNetSP(1).init(
        k, a, b, train=True))(key, x1, x1)
    imgs = {k: stack[i] for k, i in
            [("i1", 0), ("i4", 3), ("d2", 1), ("d3", 2)]}
    masks = (np.ones((1, 251, 179)) * 255, np.ones((1, 251, 179)) * 255)
    sp_out = {}
    for pc in (True, False):
        sp = SPPipeline(vfi_vars=vv, denoise_vars=dv, fusion_vars=fvsp,
                        packed_conv=pc)
        res = sp.restore(imgs["i1"][None], imgs["i4"][None],
                         imgs["d2"][None], imgs["d3"][None], *masks)
        sp_out[pc] = np.asarray(
            jnp.floor(res["pred1"] * 255), np.int16)
    d = np.abs(sp_out[True] - sp_out[False])
    print(f"SP pred1 packed-vs-flax: max uint8 delta {d.max()} "
          f"(frac>1: {(d > 1).mean():.2e})", flush=True)
    if (d > 2).mean() > 1e-3:
        bad += 1

    # one jitted train step on TPU (exercises BN train mode + sepconv VJP)
    import optax
    from sstem_tpu import losses

    model = FusionNet(output_nc=2, ngf=8)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(key, x6)
    opt = optax.adam(1e-4)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state, x, y):
        def loss_fn(p):
            pred, mut = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"])
            return losses.l1_loss(pred, y), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 6)), jnp.float32)
    y = jnp.asarray(rng.random((2, 64, 64, 2)), jnp.float32)
    for _ in range(3):
        params, stats, opt_state, loss = step(params, stats, opt_state, x, y)
    print(f"train step ok, loss={float(loss):.6f}", flush=True)
    print("VERIFY " + ("FAIL" if bad else "PASS"), flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
