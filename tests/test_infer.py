"""Inference layer tests: tiling, pipelines, flow viz, CLI smoke."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sstem_tpu.data.synthetic import synth_stack
from sstem_tpu.infer.tiles import infer_full, infer_tiled, tile_image, untile

RNG = np.random.default_rng(31)


@pytest.fixture(autouse=True)
def _fast_precision():
    import sstem_tpu.config as cfg

    cfg.set_matmul_precision("default")
    yield
    cfg.set_matmul_precision("highest")


def test_tile_untile_roundtrip():
    img = jnp.asarray(RNG.standard_normal((100, 140, 3)), jnp.float32)
    tiles, grid = tile_image(img, tile=64, halo=16)
    assert tiles.shape == (2 * 3, 96, 96, 3)
    back = untile(tiles, grid, halo=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-6)


def test_infer_tiled_matches_full_for_local_op():
    """A 3x3 conv (RF < halo) must give identical tiled/full results."""
    from flax import linen as nn

    class Local(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(2, (3, 3), padding="SAME")(x)

    m = Local()
    img = jnp.asarray(RNG.standard_normal((96, 96, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), img[None])
    apply_fn = jax.jit(lambda x: m.apply(v, x))
    full = apply_fn(img[None])[0]
    tiled = infer_tiled(apply_fn, img, tile=32, halo=8, batch=2)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_infer_full_pads_and_crops():
    def apply_fn(x):
        assert x.shape[1] % 32 == 0 and x.shape[2] % 32 == 0
        return x * 2.0

    img = jnp.ones((1, 100, 130, 1))
    out = infer_full(apply_fn, img, multiple=32)
    assert out.shape == (1, 100, 130, 1)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def _tiny_sff_pipeline():
    from sstem_tpu.infer.pipeline import SFFPipeline
    from sstem_tpu.models import FusionNet, IFNet, UNetSFF

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 6), jnp.float32)
    iv = jax.jit(IFNet(5, 1).init)(key, x)
    fv = jax.jit(lambda k, xx: FusionNet(output_nc=2).init(k, xx, train=True))(key, x)
    uv = jax.jit(lambda k, xx: UNetSFF(1).init(k, xx, train=True))(key, x)
    return SFFPipeline(interp_vars=iv, flow_vars=fv, fusion_vars=uv,
                       kernel_size=5)


def test_sff_pipeline_restore_stack():
    pipe = _tiny_sff_pipeline()
    stack = synth_stack(5, 96, 96, seed=3)
    out = pipe.restore_stack(stack, [1, 3], chunk=1)
    assert set(out) == {1, 3}
    r = out[1]
    assert r["interp"].shape == (96, 96) and r["interp"].dtype == np.uint8
    assert r["fused"].shape == (96, 96)
    assert r["stitch"].shape == (96, 96)
    assert r["flow"].shape == (96, 96, 2)


def test_sff_pipeline_restore_stack_scanned_matches_loop():
    """The single-dispatch lax.map path must match restore_stack to <= 1
    uint8 (its interp hand-off skips the x255/255 float round trip) with
    an odd-group tail (3 ids, chunk 2) exercising the pad-group dedup."""
    pipe = _tiny_sff_pipeline()
    stack = synth_stack(7, 96, 96, seed=3)
    ids = [1, 3, 5]
    ref = pipe.restore_stack(stack, ids, chunk=2)
    out = pipe.restore_stack_scanned(stack, ids, chunk=2)
    assert set(out) == set(ids)
    for i in ids:
        for k in ("interp", "fused", "warped", "stitch"):
            a = out[i][k].astype(np.int32)
            b = ref[i][k].astype(np.int32)
            assert a.dtype == np.int32 and out[i][k].dtype == np.uint8
            assert np.abs(a - b).max() <= 1, (i, k)
        np.testing.assert_allclose(out[i]["flow"], ref[i]["flow"],
                                   rtol=1e-5, atol=1e-5)


def test_sff_pipeline_scanned_odd_size_interp_parity():
    """At non-32-multiple sizes both paths edge-pad the interp INPUTS the
    same way, so interp must still match <= 1 everywhere; fused/stitch
    have a documented border-band regime there (pipeline.py docstring)."""
    pipe = _tiny_sff_pipeline()
    stack = synth_stack(5, 83, 101, seed=5)
    ref = pipe.restore_stack(stack, [1, 3], chunk=2)
    out = pipe.restore_stack_scanned(stack, [1, 3], chunk=2)
    for i in (1, 3):
        d = np.abs(out[i]["interp"].astype(np.int32)
                   - ref[i]["interp"].astype(np.int32))
        assert d.max() <= 1, (i, d.max())
        assert out[i]["fused"].shape == (83, 101)


def test_sp_pipeline_shapes():
    from sstem_tpu.infer.pipeline import SPPipeline
    from sstem_tpu.models import FusionNetSP, IFNet, UNetSP

    key = jax.random.PRNGKey(1)
    x6 = jnp.zeros((1, 64, 64, 6), jnp.float32)
    x1 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    pipe = SPPipeline(
        vfi_vars=jax.jit(IFNet(5, 2).init)(key, x6),
        denoise_vars=jax.jit(lambda k, xx: UNetSP(1).init(k, xx, train=True))(key, x1),
        fusion_vars=jax.jit(
            lambda k, a, b: FusionNetSP(1).init(k, a, b, train=True)
        )(key, x1, x1),
        kernel_size=5,
    )
    stack = synth_stack(4, 64, 64, seed=4)
    mask = np.full((64, 64), 128, np.uint8)
    out = pipe.restore(
        jnp.asarray(stack[0][None]), jnp.asarray(stack[3][None]),
        jnp.asarray(stack[1][None]), jnp.asarray(stack[2][None]),
        jnp.asarray(mask[None]), jnp.asarray(mask[None]),
    )
    for k in ("pred1", "pred2", "vfi1", "vfi2", "denoise1", "denoise2"):
        assert out[k].shape == (1, 64, 64), k


def test_flow_display():
    from sstem_tpu.ops.flow_display import dense_flow

    flow = RNG.standard_normal((32, 32, 2)).astype(np.float32) * 5
    img = dense_flow(flow)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    # zero flow renders (near) white center color
    img0 = dense_flow(np.zeros((8, 8, 2), np.float32))
    assert img0.min() >= 250


def test_interp_cli_smoke(tmp_path):
    """End-to-end CLI: save an orbax ckpt, build the data tree, run valid mode."""
    import yaml
    from PIL import Image

    from sstem_tpu.cli import infer_interp
    from sstem_tpu.models import IFNet
    from sstem_tpu.train.checkpoint import save_checkpoint

    # checkpoint
    model = IFNet(kernel_size=5, n_frames=1)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 6), jnp.float32))
    ckpt_dir = str(tmp_path / "models")
    save_checkpoint(ckpt_dir, 1, variables["params"])

    # data tree: sections 0..3, damaged = [1]
    ip = tmp_path / "testdata"
    (ip / "stackA").mkdir(parents=True)
    stack = synth_stack(4, 64, 64, seed=6)
    for i in range(4):
        Image.fromarray(stack[i]).save(ip / "stackA" / f"{i:04d}.png")
    (ip / "stackA.txt").write_text("1\n")

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "NAME": "t", "TRAIN": {"kernel_size": 5}, "TEST": {"pad": 0},
    }))

    op = tmp_path / "out"
    infer_interp.main([
        "-c", str(cfg_path), "-id", "interp", "-m", "valid",
        "-ip", str(ip) + "/", "-t", "stackA", "-op", str(op),
        "--ckpt", ckpt_dir,
    ])
    assert (op / "stackA_interp" / "0001.png").exists()
    scores = (op / "stackA_interp" / "scores.txt").read_text()
    assert "PSNR" in scores
