"""PyTorch-checkpoint importers: reference state dicts -> flax variables.

Handles the reference's checkpoint quirks (SURVEY §2.7 P2):
  * multi-GPU 'module.' prefixes are stripped
    (sff_scripts_interp/inference.py:52-58)
  * BatchNorm 'num_batches_tracked' counters are dropped
    (sff_scripts_fusion/inference.py:103-108)
  * payloads may be {'model_weights': state_dict, ...} or a bare state dict

Weight layout conversions: Conv2d OIHW -> HWIO; ConvTranspose2d
(in, out, kh, kw) -> (kh, kw, out, in); BN weight/bias -> scale/bias params
and running_mean/var -> batch_stats.

Vestigial reference parameters are ignored on import: the IFNet SR branch
(srconv1..4, model_interp.py:39-44) and the 8 unused SP kernel heads
(upconv51_15..18/25..28, networks.py:42-66).
"""

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_state_dict(path_or_dict):
    """torch.load a reference ckpt; returns a clean {name: ndarray} dict."""
    if isinstance(path_or_dict, dict):
        sd = path_or_dict
    else:
        import torch

        sd = torch.load(path_or_dict, map_location="cpu", weights_only=False)
    if "model_weights" in sd:
        sd = sd["model_weights"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = _to_numpy(v)
    return out


def _conv(sd, name):
    w = sd[f"{name}.weight"]
    return {"Conv_0": {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": sd[f"{name}.bias"],
    }}


def _bn(sd, name):
    params = {"BatchNorm_0": {"scale": sd[f"{name}.weight"],
                              "bias": sd[f"{name}.bias"]}}
    stats = {"BatchNorm_0": {"mean": sd[f"{name}.running_mean"],
                             "var": sd[f"{name}.running_var"]}}
    return params, stats


def _deconv(sd, name):
    w = sd[f"{name}.weight"]  # (in, out, kh, kw)
    return {"kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": sd[f"{name}.bias"]}


def _conv_module(sd, tname):
    """reference _conv_module Sequential: Conv(0) relu Conv(2) relu Conv(4)."""
    return {"conv0": _conv(sd, f"{tname}.0"),
            "conv1": _conv(sd, f"{tname}.2"),
            "conv2": _conv(sd, f"{tname}.4")}


def load_torch_ifnet(path_or_dict, n_frames=1):
    """IFNet importer (SFF model_interp.py / SP networks.py)."""
    sd = load_state_dict(path_or_dict)
    p = {}
    for ours, theirs in [
        ("conv32", "conv32"), ("conv64", "conv64"), ("conv128", "conv128"),
        ("conv256", "conv256"), ("conv512", "conv512"),
        ("conv512x512", "conv512x512"), ("upconv256", "upconv256"),
        ("upconv128", "upconv128"), ("upconv64", "upconv64"),
    ]:
        p[ours] = _conv_module(sd, theirs)
    for ours, theirs in [
        ("upsamp512", "upsamp512"), ("upsamp256", "upsamp256"),
        ("upsamp128", "upsamp128"), ("upsamp64", "upsamp64"),
    ]:
        p[ours] = {"conv": _conv(sd, f"{theirs}.1")}

    def head(tname):
        return {"conv0": _conv(sd, f"{tname}.0"),
                "conv1": _conv(sd, f"{tname}.2"),
                "conv2": _conv(sd, f"{tname}.4"),
                "conv3": _conv(sd, f"{tname}.7")}

    if n_frames == 1:
        # forward order (model_interp.py:86-89): k2h<-_1, k2v<-_2, k1h<-_3, k1v<-_4
        p["head2h"] = head("upconv51_1")
        p["head2v"] = head("upconv51_2")
        p["head1h"] = head("upconv51_3")
        p["head1v"] = head("upconv51_4")
    else:
        # networks.py:105-114: frame1 heads 11..14, frame2 heads 21..24
        p["head1h_f1"] = head("upconv51_11")
        p["head1v_f1"] = head("upconv51_12")
        p["head2h_f1"] = head("upconv51_13")
        p["head2v_f1"] = head("upconv51_14")
        p["head1h_f2"] = head("upconv51_21")
        p["head1v_f2"] = head("upconv51_22")
        p["head2h_f2"] = head("upconv51_23")
        p["head2v_f2"] = head("upconv51_24")
    return {"params": p}


def _conv_block(sd, tname):
    """FusionNet conv_block Sequential: Conv(0) BN(1) act."""
    bnp, bns = _bn(sd, f"{tname}.1")
    return ({"conv": _conv(sd, f"{tname}.0"), "bn": bnp},
            {"bn": bns})


def _conv_block3(sd, tname):
    b0p, b0s = _conv_block(sd, f"{tname}.0")
    b1p, b1s = _conv_block(sd, f"{tname}.1")
    bnp, bns = _bn(sd, f"{tname}.3")
    return ({"block0": b0p, "block1": b1p,
             "conv": _conv(sd, f"{tname}.2"), "bn": bnp},
            {"block0": b0s, "block1": b1s, "bn": bns})


def _conv_residual_conv(sd, tname):
    c1p, c1s = _conv_block(sd, f"{tname}.conv_1")
    c2p, c2s = _conv_block3(sd, f"{tname}.conv_2")
    c3p, c3s = _conv_block(sd, f"{tname}.conv_3")
    return ({"conv_1": c1p, "conv_2": c2p, "conv_3": c3p},
            {"conv_1": c1s, "conv_2": c2s, "conv_3": c3s})


def load_torch_fusionnet(path_or_dict):
    """FusionNet importer (model_fusionnet.py)."""
    sd = load_state_dict(path_or_dict)
    params, stats = {}, {}
    for blk in ["down_1", "down_2", "down_3", "down_4", "bridge",
                "up_1", "up_2", "up_3", "up_4"]:
        params[blk], stats[blk] = _conv_residual_conv(sd, blk)
    for blk in ["deconv_1", "deconv_2", "deconv_3", "deconv_4"]:
        bnp, bns = _bn(sd, f"{blk}.1")
        params[blk] = {"deconv": _deconv(sd, f"{blk}.0"), "bn": bnp}
        stats[blk] = {"bn": bns}
    params["out"] = _conv(sd, "out")
    return {"params": params, "batch_stats": stats}


def load_torch_unet_sff(path_or_dict):
    """SFF fusion U-Net importer (model_unet.py)."""
    sd = load_state_dict(path_or_dict)
    params, stats = {}, {}

    def contract(tname, ours):
        for oj, tj in [("conv0", 0), ("bn0", 1), ("conv1", 3), ("bn1", 4)]:
            if oj.startswith("conv"):
                params.setdefault(ours, {})[oj] = _conv(sd, f"{tname}.{tj}")
            else:
                bp, bs = _bn(sd, f"{tname}.{tj}")
                params.setdefault(ours, {})[oj] = bp
                stats.setdefault(ours, {})[oj] = bs

    def expand(tname, ours):
        contract(tname, ours)
        params[ours]["deconv"] = _deconv(sd, f"{tname}.6")
        bp, bs = _bn(sd, f"{tname}.7")
        params[ours]["bn2"] = bp
        stats[ours]["bn2"] = bs

    contract("conv_encode1", "conv_encode1")
    contract("conv_encode2", "conv_encode2")
    contract("conv_encode3", "conv_encode3")
    expand("conv_decode3", "conv_decode3")
    expand("conv_decode2", "conv_decode2")

    # bottleneck (flat names in our module)
    params["bottleneck_conv0"] = _conv(sd, "bottleneck.0")
    params["bottleneck_bn0"], stats["bottleneck_bn0"] = _bn(sd, "bottleneck.1")
    params["bottleneck_conv1"] = _conv(sd, "bottleneck.3")
    params["bottleneck_bn1"], stats["bottleneck_bn1"] = _bn(sd, "bottleneck.4")
    params["bottleneck_deconv"] = _deconv(sd, "bottleneck.6")
    params["bottleneck_bn2"], stats["bottleneck_bn2"] = _bn(sd, "bottleneck.7")

    params["final_conv0"] = _conv(sd, "final_layer.0")
    params["final_bn0"], stats["final_bn0"] = _bn(sd, "final_layer.1")
    params["final_conv1"] = _conv(sd, "final_layer.3")
    params["final_bn1"], stats["final_bn1"] = _bn(sd, "final_layer.4")
    return {"params": params, "batch_stats": stats}


def _double_conv(sd, tname):
    p, s = {}, {}
    p["conv0"] = _conv(sd, f"{tname}.0")
    p["bn0"], s["bn0"] = _bn(sd, f"{tname}.1")
    p["conv1"] = _conv(sd, f"{tname}.3")
    p["bn1"], s["bn1"] = _bn(sd, f"{tname}.4")
    return p, s


def load_torch_unet_sp(path_or_dict):
    """SP U-Net / FusionNetSP importer (networks.py milesial trunk)."""
    sd = load_state_dict(path_or_dict)
    params, stats = {}, {}
    params["inc"], stats["inc"] = _double_conv(sd, "inc.double_conv")
    for i in range(1, 5):
        p, s = _double_conv(sd, f"down{i}.maxpool_conv.1.double_conv")
        params[f"down{i}"] = {"conv": p}
        stats[f"down{i}"] = {"conv": s}
    for i in range(1, 5):
        p, s = _double_conv(sd, f"up{i}.conv.double_conv")
        params[f"up{i}"] = {"conv": p}
        stats[f"up{i}"] = {"conv": s}
    params["outc"] = _conv(sd, "outc.conv")
    return {"params": {"backbone": params},
            "batch_stats": {"backbone": stats}}


# ---------------------------------------------------------------------------
# Optimizer-state import (VERDICT r1 missing #2)
# ---------------------------------------------------------------------------

def load_torch_optimizer(path_or_dict, weights_loader, params, opt,
                         **loader_kw):
    """Import a reference checkpoint's Adam moments into an optax state.

    The SP trainers save ``optimizer_weights`` (torch Adam state_dict) next
    to the model weights (sp_scripts_train/main_interp.py:193-196); this
    lets a reference training run be resumed mid-flight with its moments.

    torch keys Adam state by parameter *index* in ``model.parameters()``
    order, which equals the state_dict insertion order filtered to trainable
    entries (buffers excluded). Each moment tensor gets the same layout
    transform as its weight by re-running the model's ``weights_loader``
    over synthetic state dicts holding the moments.

    Args:
      path_or_dict: reference .ckpt path or its loaded payload dict.
      weights_loader: the matching importer (e.g. ``load_torch_ifnet``).
      params: our initialized flax params (the target tree structure).
      opt: the optax optimizer whose ``init(params)`` state is templated.
      **loader_kw: forwarded to ``weights_loader`` (e.g. ``n_frames=2``).

    Returns:
      (opt_state, step) — the populated optax state and the torch step count.
    """
    import jax
    import jax.numpy as jnp

    if isinstance(path_or_dict, dict):
        ckpt = path_or_dict
    else:
        import torch

        ckpt = torch.load(path_or_dict, map_location="cpu",
                          weights_only=False)
    sd = {}
    for k, v in ckpt["model_weights"].items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v
    ow = ckpt["optimizer_weights"]
    state = {int(k): v for k, v in ow["state"].items()}

    buffers = ("running_mean", "running_var", "num_batches_tracked")
    pnames = [k for k in sd if not k.endswith(buffers)]

    def moment_sd(which):
        md = {}
        for k, v in sd.items():
            if k in pnames:
                md[k] = _to_numpy(state[pnames.index(k)][which])
            else:
                md[k] = np.zeros_like(_to_numpy(v))  # buffer placeholder
        return md

    mu = weights_loader(moment_sd("exp_avg"), **loader_kw)["params"]
    nu = weights_loader(moment_sd("exp_avg_sq"), **loader_kw)["params"]
    step0 = state[0]["step"]
    step = int(_to_numpy(step0)) if not isinstance(step0, int) else step0

    # moment trees must mirror the target params exactly
    assert (jax.tree_util.tree_structure(mu)
            == jax.tree_util.tree_structure(params)), (
        "imported optimizer moments do not match the parameter tree")

    import optax

    count = jnp.asarray(step, jnp.int32)

    def inject(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(count=count,
                              mu=jax.tree_util.tree_map(jnp.asarray, mu),
                              nu=jax.tree_util.tree_map(jnp.asarray, nu))
        if hasattr(s, "_replace") and hasattr(s, "count"):
            return s._replace(count=count)  # LR-schedule step counters
        if isinstance(s, tuple):
            items = [inject(x) for x in s]
            if hasattr(s, "_fields"):  # other NamedTuple states
                return type(s)(*items)
            return tuple(items)
        return s

    return inject(opt.init(params)), step
