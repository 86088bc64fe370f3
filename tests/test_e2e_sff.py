"""Full SFF story end-to-end through the actual CLIs (tiny models):

train interp -> interp over training set -> train unfolding -> train fusion
(frozen flow) -> full-pipeline stack restoration. Exercises configs,
providers, trainers, checkpoints, importers-on-our-own-ckpts, and the fused
inference path in one chain.
"""

import glob
import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from sstem_tpu.data.synthetic import synth_stack, write_triplet_tree


@pytest.fixture(autouse=True)
def _fast_precision():
    import sstem_tpu.config as cfg

    cfg.set_matmul_precision("default")
    yield
    cfg.set_matmul_precision("highest")


def _latest_dir(root):
    subs = sorted(glob.glob(os.path.join(root, "*")))
    assert subs, root
    return subs[-1]


@pytest.mark.slow
def test_full_sff_chain(tmp_path):
    from sstem_tpu.cli import (
        infer_interp_trainingset, train_fusion, train_interp, train_unfolding,
    )

    data = str(tmp_path / "data")
    write_triplet_tree(data, n_triplets=3, size=160, seed=11)
    caches = str(tmp_path / "caches")
    models = str(tmp_path / "models")

    base_aug = {
        "random_fliplr": True, "random_flipud": True, "random_flipz": True,
        "random_rotation": True, "swap": False, "color_jitter": False,
        "COLOR": {"brightness": 0.2, "contrast": 0.2, "saturation": 0.2},
        "elastic_trans": False,
        "ELASTIC": {"alpha_range": 100, "sigma": 10, "shave": 20},
        "gauss_noise": False, "GAUSS": {"gauss_mean": 0, "gauss_sigma": 0.001},
    }

    def write_cfg(name, train_extra, data_extra):
        cfg = {
            "NAME": name,
            "TRAIN": {
                "resume": False, "if_valid": False,
                "cache_path": caches, "save_path": models,
                "input_nc": 6, "output_nc": 1, "ngf": 4, "pad": 0,
                "loss": "L1", "kernel_size": 5,
                "total_iters": 2, "warmup_iters": 0,
                "base_lr": 1e-3, "end_lr": 1e-4,
                "display_freq": 1, "valid_freq": 2, "save_freq": 2,
                "decay_iters": 100, "weight_decay": None, "power": 1.5,
                "batch_size": 2, "num_workers": 1, "is_cuda": False,
                "random_seed": 555,
                **train_extra,
            },
            "DATA": {
                "folder_name": data, "train_txt": "train_data.txt",
                "patch_size": [64, 64], "AUG": base_aug, **data_extra,
            },
            "TEST": {"pad": 0},
        }
        path = str(tmp_path / f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        return path

    # 1) interp trainer
    cfg_i = write_cfg("interp_t", {}, {})
    train_interp.main(["-c", cfg_i, "--max-iters", "2"])
    interp_save = _latest_dir(models)
    assert glob.glob(os.path.join(interp_save, "model-*.ckpt"))

    # 2) interp over the training set (writes interp_train_data + txt)
    infer_interp_trainingset.main([
        "-c", cfg_i, "--ckpt", interp_save, "-bs", "2",
    ])
    assert os.path.exists(os.path.join(data, "interp_train_data.txt"))

    # 3) unfolding trainer (crop 100 -> det 64, flow label)
    cfg_u = write_cfg(
        "unfold_t", {"output_nc": 2},
        {"patch_size": [100, 100], "det_size": 64,
         "interp_train_txt": "interp_train_data.txt", "gt_line": False},
    )
    train_unfolding.main(["-c", cfg_u, "--max-iters", "2"])
    unfold_save = _latest_dir(models)
    flow_ckpts = glob.glob(os.path.join(unfold_save, "model-*.ckpt"))
    assert flow_ckpts

    # 4) fusion trainer with the frozen flow net
    cfg_f = write_cfg(
        "fusion_t",
        {"output_nc": 1, "flownet_path": unfold_save,
         "flownet_id": os.path.basename(flow_ckpts[-1])},
        {"patch_size": [100, 100], "det_size": 64,
         "interp_train_txt": "interp_train_data.txt", "gt_line": False},
    )
    train_fusion.main(["-c", cfg_f, "--max-iters", "2"])
    fusion_save = _latest_dir(models)
    assert glob.glob(os.path.join(fusion_save, "model-*.ckpt"))

    # 5) full pipeline restore with the trained checkpoints
    from sstem_tpu.cli._ckpt import load_model_variables
    from sstem_tpu.infer.pipeline import SFFPipeline

    pipe = SFFPipeline(
        interp_vars=load_model_variables(interp_save, "ifnet_sff"),
        flow_vars=load_model_variables(unfold_save, "fusionnet"),
        fusion_vars=load_model_variables(fusion_save, "unet_sff"),
        kernel_size=5, ngf=4,
    )
    stack = synth_stack(4, 96, 96, seed=12)
    out = pipe.restore_stack(stack, [1, 2])
    for i in (1, 2):
        for k in ("interp", "fused", "stitch", "warped"):
            assert out[i][k].shape == (96, 96)
            assert out[i][k].dtype == np.uint8


@pytest.mark.slow
def test_unfolding_trainer_device_datagen(tmp_path):
    """--device-datagen path: host streams raw crops, degradation in-step."""
    from sstem_tpu.cli import train_unfolding

    data = str(tmp_path / "data")
    write_triplet_tree(data, n_triplets=2, size=160, seed=15)
    with open(os.path.join(data, "train_data.txt")) as f:
        rows = [r.split() for r in f.read().splitlines()]
    with open(os.path.join(data, "interp_train_data.txt"), "w") as f:
        f.write("\n".join(r[1] for r in rows) + "\n")

    cfg = {
        "NAME": "unfold_dev",
        "TRAIN": {
            "resume": False, "if_valid": False,
            "cache_path": str(tmp_path / "caches"),
            "save_path": str(tmp_path / "models"),
            "input_nc": 6, "output_nc": 2, "ngf": 4, "pad": 0,
            "loss": "L1", "kernel_size": 5, "total_iters": 2,
            "warmup_iters": 0, "base_lr": 1e-3, "end_lr": 1e-4,
            "display_freq": 1, "valid_freq": 2, "save_freq": 2,
            "decay_iters": 100, "weight_decay": None, "power": 1.5,
            "batch_size": 2, "num_workers": 1, "is_cuda": False,
            "random_seed": 555,
        },
        "DATA": {
            "folder_name": data, "train_txt": "train_data.txt",
            "interp_train_txt": "interp_train_data.txt",
            "patch_size": [100, 100], "det_size": 64,
            "AUG": {
                "random_fliplr": True, "random_flipud": True,
                "random_flipz": True, "random_rotation": True,
                "swap": False, "color_jitter": False,
                "COLOR": {"brightness": 0.2, "contrast": 0.2,
                          "saturation": 0.2},
                "elastic_trans": False,
                "ELASTIC": {"alpha_range": 100, "sigma": 10, "shave": 20},
                "gauss_noise": False,
                "GAUSS": {"gauss_mean": 0, "gauss_sigma": 0.001},
            },
        },
        "TEST": {"pad": 0},
    }
    import yaml as _yaml

    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(cfg, f)
    train_unfolding.main(["-c", cfg_path, "--max-iters", "2",
                          "--device-datagen"])
    models_dir = glob.glob(str(tmp_path / "models" / "*"))
    assert models_dir
    assert glob.glob(os.path.join(models_dir[-1], "model-*.ckpt"))


def test_fusion_trainer_device_datagen(tmp_path):
    """Fusion --device-datagen: fold synthesis + frozen-flow warp + labels
    inside the jitted step (host streams raw crops)."""
    import jax
    import jax.numpy as jnp

    from sstem_tpu.cli import train_fusion
    from sstem_tpu.models import FusionNet
    from sstem_tpu.train.checkpoint import save_checkpoint

    data = str(tmp_path / "data")
    write_triplet_tree(data, n_triplets=2, size=160, seed=16)
    with open(os.path.join(data, "train_data.txt")) as f:
        rows = [r.split() for r in f.read().splitlines()]
    with open(os.path.join(data, "interp_train_data.txt"), "w") as f:
        f.write("\n".join(r[1] for r in rows) + "\n")

    # frozen flow net checkpoint
    flow_dir = str(tmp_path / "flow")
    fv = jax.jit(lambda k, x: FusionNet(output_nc=2, ngf=4).init(
        k, x, train=True))(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 6), jnp.float32))
    save_checkpoint(flow_dir, 1, fv["params"],
                    batch_stats=fv["batch_stats"])

    cfg = {
        "NAME": "fusion_dev",
        "TRAIN": {
            "resume": False, "if_valid": False,
            "cache_path": str(tmp_path / "caches"),
            "save_path": str(tmp_path / "models"),
            "input_nc": 6, "output_nc": 1, "ngf": 4, "pad": 0,
            "loss": "L1", "kernel_size": 5, "total_iters": 2,
            "warmup_iters": 0, "base_lr": 1e-3, "end_lr": 1e-4,
            "display_freq": 1, "valid_freq": 2, "save_freq": 2,
            "decay_iters": 100, "weight_decay": None, "power": 1.5,
            "batch_size": 2, "num_workers": 1, "is_cuda": False,
            "random_seed": 556,
            "flownet_path": flow_dir, "flownet_id": "model-000001.ckpt",
        },
        "DATA": {
            "folder_name": data, "train_txt": "train_data.txt",
            "interp_train_txt": "interp_train_data.txt",
            "patch_size": [100, 100], "det_size": 64,
            "AUG": {
                "random_fliplr": True, "random_flipud": True,
                "random_flipz": True, "random_rotation": True,
                "swap": False, "color_jitter": False,
                "COLOR": {"brightness": 0.2, "contrast": 0.2,
                          "saturation": 0.2},
                "elastic_trans": False,
                "ELASTIC": {"alpha_range": 100, "sigma": 10, "shave": 20},
                "gauss_noise": False,
                "GAUSS": {"gauss_mean": 0, "gauss_sigma": 0.001},
            },
        },
        "TEST": {"pad": 0},
    }
    import yaml as _yaml

    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(cfg, f)
    train_fusion.main(["-c", cfg_path, "--max-iters", "2",
                       "--device-datagen"])
    models_dir = glob.glob(str(tmp_path / "models" / "*"))
    assert models_dir
    assert glob.glob(os.path.join(models_dir[-1], "model-*.ckpt"))
