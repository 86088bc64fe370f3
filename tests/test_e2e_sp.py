"""Full SP story end-to-end: SP simulator -> dataset txt -> joint trainer ->
per-branch checkpoints -> test_sp_fusion CLI."""

import glob
import os

import numpy as np
import pytest
import yaml
from PIL import Image

import jax

from sstem_tpu.data.synthetic import synth_stack


@pytest.fixture(autouse=True)
def _fast_precision():
    import sstem_tpu.config as cfg

    cfg.set_matmul_precision("default")
    yield
    cfg.set_matmul_precision("highest")


@pytest.mark.slow
def test_full_sp_chain(tmp_path):
    from sstem_tpu.cli import simulate_sp, test_sp_fusion, train_sp_fusion

    data = str(tmp_path / "sp_data") + "/"
    os.makedirs(data, exist_ok=True)

    # quartet of clean sections + degraded 2/3 via the SP simulator CLI
    stack = synth_stack(4, 128, 128, seed=21)
    stem = "0001"
    for j, suffix in enumerate(["_1", "_2", "_3", "_4"]):
        Image.fromarray(stack[j]).save(data + stem + suffix + ".png")
    simulate_sp.main([
        "-p", data, "--synthetic-bank", "6", "--num-draws", "30",
        "--seed", "3",
    ])
    assert os.path.exists(data + stem + "_2_degra.png")
    assert os.path.exists(data + stem + "_2_degra_maska.png")
    assert os.path.exists(data + stem + "_2_degra_maskb.png")

    # interp stand-ins + dataset txt
    for s in ("_2_interp", "_3_interp"):
        Image.fromarray(stack[1]).save(data + stem + s + ".png")
    from sstem_tpu.data.providers import write_sp_txt

    write_sp_txt(data, 1)

    # joint fusion trainer (2 steps, tiny K)
    cfg = {
        "data_folder": data, "data_txt": data + "sp_train_data.txt",
        "mode": "a", "patch_size": 64, "if_rotate": True,
        "if_bdadjust": False, "if_use_vfiImg": False,
        "batch_size": 1, "kernel_size": 5,
        "if_pretrained": False, "vfi_lr_weight": 1.0e-20,
        "denoise_lr_weight": 1.0e-6,
        "base_lr": 1e-4, "n_epochs": 300, "if_fusion_loss_only": False,
        "cuda": False, "save_freq": 2, "valid_freq": 1,
        "cache_path": str(tmp_path / "cache"),
        "save_path": str(tmp_path / "models"),
        "random_seed": 7,
    }
    cfg_path = str(tmp_path / "train_fusion.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_sp_fusion.main(["-opt", cfg_path, "--max-iters", "2"])

    save_dir = sorted(glob.glob(str(tmp_path / "models" / "*")))[-1]
    for branch in ("vfi", "denoise", "fusion"):
        assert glob.glob(os.path.join(save_dir, branch, "model-*.ckpt")), branch

    # SP test CLI over the quartet
    out = str(tmp_path / "sp_out")
    test_sp_fusion.main([
        "-mp", save_dir, "-dp", data,
        "-im1", stem + "_1.png", "-im2d", stem + "_2_degra.png",
        "-im2m", stem + "_2_degra_maska.png",
        "-im3d", stem + "_3_degra.png",
        "-im3m", stem + "_3_degra_maska.png",
        "-im4", stem + "_4.png", "-sp", out, "--kernel-size", "5",
    ])
    p1 = np.asarray(Image.open(os.path.join(out, "pred1.png")))
    p2 = np.asarray(Image.open(os.path.join(out, "pred2.png")))
    assert p1.shape == (128, 128) and p2.shape == (128, 128)
