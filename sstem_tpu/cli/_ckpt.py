"""Checkpoint loading for inference CLIs: orbax dirs or torch .ckpt files."""

import os


def load_model_variables(path, kind):
    """Load flax variables for a model ``kind`` from either an orbax
    checkpoint directory (ours) or a reference torch .ckpt/.pth file.

    kind in {'ifnet_sff', 'ifnet_sp', 'fusionnet', 'unet_sff', 'unet_sp'}.
    """
    path = os.path.abspath(path)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        from sstem_tpu.train.checkpoint import latest_step

        if not os.path.basename(path).endswith(".ckpt"):
            step = latest_step(path)
            assert step is not None, f"no checkpoints under {path}"
            path = os.path.join(path, "model-%06d.ckpt" % step)
        ck = ocp.StandardCheckpointer().restore(path)
        mw = ck["model_weights"]
        out = {"params": mw["params"]}
        if "batch_stats" in mw:
            out["batch_stats"] = mw["batch_stats"]
        return out

    from sstem_tpu.compat import torch_ckpt as tc

    if kind == "ifnet_sff":
        return tc.load_torch_ifnet(path, n_frames=1)
    if kind == "ifnet_sp":
        return tc.load_torch_ifnet(path, n_frames=2)
    if kind == "fusionnet":
        return tc.load_torch_fusionnet(path)
    if kind == "unet_sff":
        return tc.load_torch_unet_sff(path)
    if kind == "unet_sp":
        return tc.load_torch_unet_sp(path)
    raise ValueError(f"unknown model kind {kind}")
