"""Training-layer tests: schedules, optimizer parity, checkpointing,
end-to-end tiny training (loss decreases), and multi-device data parallelism
on the virtual CPU mesh."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sstem_tpu.train.schedules import poly_warmup_decay_lr, step_lr
from sstem_tpu.train.trainer import TrainState, make_optimizer, make_train_step

RNG = np.random.default_rng(21)


@pytest.fixture(autouse=True)
def _fast_precision():
    import sstem_tpu.config as cfg

    cfg.set_matmul_precision("default")
    yield
    cfg.set_matmul_precision("highest")


def _reference_calculate_lr(iters, base_lr, end_lr, warmup_iters, decay_iters,
                            power):
    """Transcription of the documented formula (main_ms.py:127-135)."""
    if iters < warmup_iters:
        return (base_lr - end_lr) * pow(float(iters) / warmup_iters, power) + end_lr
    if iters < decay_iters:
        return (base_lr - end_lr) * pow(
            1 - float(iters - warmup_iters) / decay_iters, power
        ) + end_lr
    return end_lr


def test_poly_schedule_matches_reference_formula():
    sched = poly_warmup_decay_lr(1e-3, 1e-4, 1000, 100000, 1.5)
    for it in [0, 1, 500, 1000, 5000, 99999, 100000, 200000]:
        ref = _reference_calculate_lr(it, 1e-3, 1e-4, 1000, 100000, 1.5)
        assert np.isclose(float(sched(it)), ref, rtol=1e-5), it


def test_step_lr():
    sched = step_lr(1e-4, 30, 0.5, steps_per_epoch=10)
    assert np.isclose(float(sched(0)), 1e-4)
    assert np.isclose(float(sched(299)), 1e-4)      # epoch 29
    assert np.isclose(float(sched(300)), 5e-5)      # epoch 30
    assert np.isclose(float(sched(600)), 2.5e-5)    # epoch 60


def test_manual_weight_decay_matches_torch_semantics():
    """reference: p -= wd*lr*p around the Adam step == decoupled adamw."""
    import torch

    lr, wd = 1e-2, 1e-3
    w0 = RNG.standard_normal(5).astype(np.float32)
    g = RNG.standard_normal(5).astype(np.float32)

    # torch reference dynamics (main_ms.py:207-211)
    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tp], lr=lr)
    tp.grad = torch.from_numpy(g.copy())
    with torch.no_grad():
        tp.data.add_(tp.data, alpha=-wd * lr)
    topt.step()

    opt = make_optimizer(lambda s: lr, weight_decay=wd)
    state = opt.init(jnp.asarray(w0))
    updates, _ = opt.update(jnp.asarray(g), state, jnp.asarray(w0))
    got = np.asarray(optax.apply_updates(jnp.asarray(w0), updates))
    np.testing.assert_allclose(got, tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from sstem_tpu.train.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint,
    )

    params = {"w": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    save_checkpoint(str(tmp_path), 1000, params, valid_result=12.5)
    save_checkpoint(str(tmp_path), 2000, params)
    assert latest_step(str(tmp_path)) == 2000
    ck = restore_checkpoint(str(tmp_path))
    assert int(ck["current_iter"]) == 2000
    np.testing.assert_allclose(
        np.asarray(ck["model_weights"]["params"]["w"]), np.arange(4.0)
    )


def test_tiny_train_loss_decreases():
    """A 2-layer conv net on a fixed mapping: loss must drop under the
    compiled train step (exercises TrainState/optimizer/jit plumbing)."""
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
            return nn.Conv(1, (3, 3), padding="SAME")(x)

    model = Tiny()
    x = jnp.asarray(RNG.standard_normal((4, 16, 16, 2)), jnp.float32)
    y = x[..., :1] * 0.5 + 0.1

    def loss_fn(params, _, batch):
        xx, yy = batch
        pred = model.apply({"params": params}, xx)
        return jnp.mean((pred - yy) ** 2), {}

    opt = make_optimizer(lambda s: 1e-2)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    state = TrainState.create(params, opt)
    step = make_train_step(loss_fn, opt)

    first = None
    for i in range(30):
        state, m = step(state, (x, y))
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first * 0.5
    assert int(state.step) == 30


def test_data_parallel_mesh_step():
    """DP over the 8-device CPU mesh: replicated state + batch sharding."""
    from flax import linen as nn

    from sstem_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    assert jax.device_count() >= 8

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(1, (3, 3), padding="SAME")(x)

    model = Tiny()
    mesh = make_mesh(n_data=8)
    x = jnp.asarray(RNG.standard_normal((16, 8, 8, 1)), jnp.float32)
    y = 2 * x

    def loss_fn(params, _, batch):
        xx, yy = batch
        return jnp.mean((model.apply({"params": params}, xx) - yy) ** 2), {}

    opt = make_optimizer(lambda s: 1e-2)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    # build both states up front (the compiled steps donate their inputs)
    state = replicate(TrainState.create(params, opt), mesh)
    state_s = TrainState.create(jax.tree.map(jnp.copy, params), opt)

    step = make_train_step(loss_fn, opt, mesh=mesh)
    batch = shard_batch((x, y), mesh)
    state, m1 = step(state, batch)

    # must equal the single-device step numerically
    step_s = make_train_step(loss_fn, opt)
    _, m2 = step_s(state_s, (x, y))
    assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_interp_trainer_builds_and_steps(tmp_path):
    """End-to-end slice: synthetic tree -> provider -> IFNet train step."""
    from sstem_tpu.compat.config import AttrDict
    from sstem_tpu.cli.train_interp import build
    from sstem_tpu.data.providers import AugConfig, InterpTrainDataset, Provider
    from sstem_tpu.data.synthetic import write_triplet_tree

    root = str(tmp_path / "tree")
    write_triplet_tree(root, n_triplets=2, size=96, seed=0)

    cfg = AttrDict({
        "NAME": "t", "TRAIN": {
            "kernel_size": 5, "base_lr": 1e-3, "end_lr": 1e-4,
            "warmup_iters": 0, "decay_iters": 100, "power": 1.5,
            "weight_decay": None, "loss": "L1", "batch_size": 2,
        },
    })
    model, opt, train_step, eval_fn, schedule, mesh = build(
        cfg, data_parallel=False
    )
    ds = InterpTrainDataset(root, patch_size=(32, 32), aug=AugConfig())
    provider = Provider(ds, 2, num_threads=1)

    import jax.numpy as jnp

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 6), jnp.float32)
    )
    state = TrainState.create(variables["params"], opt)
    losses_seen = []
    for _ in range(3):
        state, m = train_step(state, provider.next())
        losses_seen.append(float(m["loss"]))
    provider.close()
    assert all(np.isfinite(l) for l in losses_seen)
    assert int(state.step) == 3


def test_sp_fusion_trainer_builds_and_steps(tmp_path):
    """Joint 3-model SP trainer: one step over a synthetic quartet."""
    from PIL import Image

    from sstem_tpu.compat.config import NoneDict
    from sstem_tpu.cli.train_sp_fusion import build
    from sstem_tpu.data.providers import SPDataset, write_sp_txt
    from sstem_tpu.data.synthetic import synth_stack

    root = str(tmp_path) + "/"
    stack = synth_stack(4, 96, 96, seed=14)
    stem = "0001"
    names = [f"{stem}_1.png", f"{stem}_2.png", f"{stem}_2_degra.png",
             f"{stem}_3.png", f"{stem}_3_degra.png", f"{stem}_4.png",
             f"{stem}_2_degra_maska.png", f"{stem}_3_degra_maska.png",
             f"{stem}_2_degra_maskb.png", f"{stem}_3_degra_maskb.png",
             f"{stem}_2_interp.png", f"{stem}_3_interp.png"]
    for j, n in enumerate(names):
        Image.fromarray(stack[j % 4]).save(root + n)
    write_sp_txt(root, 1)

    cfg = NoneDict({
        "mode": "a", "base_lr": 1e-4, "kernel_size": 5,
        "vfi_lr_weight": 1e-20, "denoise_lr_weight": 1e-6,
        "if_fusion_loss_only": False,
    })
    models, opt, train_step, eval_fn, mode = build(cfg, steps_per_epoch=1)
    vfi, denoise, fusion = models

    ds = SPDataset(root, root + "sp_train_data.txt", patch_size=64)
    batch = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[ds.sample(np.random.default_rng(0))]
    )
    batch = jax.device_put(batch)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    v_vfi = jax.jit(vfi.init)(k1, jnp.zeros((1, 64, 64, 6), jnp.float32))
    v_den = jax.jit(lambda k, x: denoise.init(k, x, train=True))(
        k2, jnp.zeros((1, 64, 64, 1), jnp.float32))
    v_fus = jax.jit(lambda k, a, b: fusion.init(k, a, b, train=True))(
        k3, jnp.zeros((1, 64, 64, 1), jnp.float32),
        jnp.zeros((1, 64, 64, 1), jnp.float32))
    state = TrainState.create(
        {"vfi": v_vfi["params"], "denoise": v_den["params"],
         "fusion": v_fus["params"]},
        opt,
        batch_stats={"denoise": v_den["batch_stats"],
                     "fusion": v_fus["batch_stats"]},
    )
    state, m = train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["loss_fusion"]))
    # vfi branch is effectively frozen by its 1e-20 LR weight
    assert int(state.step) == 1


def test_remat_train_step_matches_plain():
    """jax.checkpoint'd step computes identical updates (memory/flops trade)."""
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(4, (3, 3), padding="SAME")(x))
            return nn.Conv(1, (3, 3), padding="SAME")(x)

    model = Tiny()
    x = jnp.asarray(RNG.standard_normal((2, 8, 8, 1)), jnp.float32)
    y = x * 0.3

    def loss_fn(params, _, batch):
        xx, yy = batch
        return jnp.mean((model.apply({"params": params}, xx) - yy) ** 2), {}

    opt = make_optimizer(lambda s: 1e-2)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    s1 = TrainState.create(jax.tree.map(jnp.copy, params), opt)
    s2 = TrainState.create(jax.tree.map(jnp.copy, params), opt)
    step_plain = make_train_step(loss_fn, opt)
    step_remat = make_train_step(loss_fn, opt, remat=True)
    s1, m1 = step_plain(s1, (x, y))
    s2, m2 = step_remat(s2, (x, y))
    assert np.isclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
