"""Data layer tests: augs, SFF degradation (host + device), SP simulator,
providers over a synthetic data tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sstem_tpu.data import augment
from sstem_tpu.data.sim_sff import SimuSFF, degrade_sff, degrade_sff_batch_jax
from sstem_tpu.data.synthetic import synth_blob_mask, synth_stack, write_triplet_tree

RNG = np.random.default_rng(5)


def test_dihedral_preserves_stack():
    stack = RNG.integers(0, 255, (3, 16, 16)).astype(np.uint8)
    out = augment.dihedral(stack, np.random.default_rng(0))
    assert out.shape == stack.shape
    assert sorted(out.ravel()) == sorted(stack.ravel())


def test_swap_frames():
    stack = np.stack([np.full((4, 4), i, np.uint8) for i in range(3)])
    out = augment.swap_frames(stack, np.random.default_rng(1), prob=1.1)
    assert out[0, 0, 0] == 2 and out[2, 0, 0] == 0 and out[1, 0, 0] == 1


def test_color_jitter_range():
    img = RNG.integers(0, 255, (16, 16)).astype(np.uint8)
    out = augment.color_jitter(img, np.random.default_rng(2))
    assert out.dtype == np.uint8 and out.shape == img.shape


def test_elastic_transform_shapes():
    im = RNG.uniform(0, 1, (6, 64, 64)).astype(np.float32)
    lb = RNG.uniform(0, 1, (1, 64, 64)).astype(np.float32)
    om, ol = augment.elastic_transform(im, lb, np.random.default_rng(3),
                                       shave=8)
    assert om.shape == (6, 48, 48) and ol.shape == (1, 48, 48)


def test_degrade_sff_host():
    img = synth_stack(1, 400, 400, seed=1)[0]
    d = degrade_sff(img, np.random.default_rng(4), det_size=256)
    assert d["degraded"].shape == (256, 256)
    assert d["flow2"].shape == (256, 256, 2)
    assert (d["degraded"] == 0).sum() >= 100  # fold strip present
    # flow2 should be nonzero near the fold
    assert np.abs(d["flow2"]).max() > 0


def test_simusff_offline():
    img = synth_stack(1, 420, 420, seed=2)[0]
    sim = SimuSFF(size=400, apply_noise=True)
    deg, flow, mask = sim(img, np.random.default_rng(5))
    assert deg.shape == (400, 400)
    assert (deg == 0).sum() >= 100
    assert flow.shape == (400, 400, 2)


def test_degrade_sff_jax_batch():
    imgs = synth_stack(2, 320, 320, seed=3).astype(np.float32)
    deg, flow2 = jax.jit(
        lambda x, k: degrade_sff_batch_jax(x, k, det_size=256, candidates=4)
    )(jnp.asarray(imgs), jax.random.PRNGKey(0))
    deg = np.asarray(deg)
    flow2 = np.asarray(flow2)
    assert deg.shape == (2, 256, 256)
    assert flow2.shape == (2, 256, 256, 2)
    for b in range(2):
        assert (deg[b] == 0).sum() >= 100
        assert np.abs(flow2[b]).max() > 0


def test_sp_simulator_with_synthetic_bank():
    from sstem_tpu.data.sim_sp import MaskBank, extract_m, simu_sp

    bank = MaskBank.synthetic(n=6, seed=7, size_range=(64, 128))
    assert len(bank) >= 4
    img = synth_stack(1, 512, 512, seed=8)[0]
    deg, maska, maskb = simu_sp(img, bank, np.random.default_rng(9),
                                num_draws=40)
    assert deg.shape == img.shape and maska.shape == img.shape
    assert maskb.shape == img.shape
    # degraded image must differ from the original inside some blobs
    assert np.abs(deg.astype(int) - img.astype(int)).max() > 10
    # maska: 255 outside artifacts, lower inside
    assert (maska == 255).mean() > 0.3
    assert (maska < 200).mean() > 0.005


def test_extract_m_recovers_dark_blob():
    from sstem_tpu.data.sim_sp import extract_m

    img = np.full((256, 256), 200, np.uint8)
    yy, xx = np.mgrid[0:256, 0:256]
    blob = (yy - 128) ** 2 + (xx - 128) ** 2 <= 40**2
    img[blob] = 20  # dark artifact
    m = extract_m(img)
    assert m.shape == img.shape
    # recovered mask covers the blob
    assert m[128, 128] == 255
    assert m[10, 10] == 0


def test_interp_provider_stream(tmp_path):
    from sstem_tpu.data.providers import AugConfig, InterpTrainDataset, Provider

    root = str(tmp_path / "tree")
    write_triplet_tree(root, n_triplets=3, size=300, seed=0)
    ds = InterpTrainDataset(root, patch_size=(64, 64), aug=AugConfig())
    im, lb = ds.sample(np.random.default_rng(0))
    assert im.shape == (64, 64, 6) and lb.shape == (64, 64, 1)
    assert 0 <= im.min() and im.max() <= 1

    p = Provider(ds, batch_size=2, num_threads=1)
    batch = p.next()
    assert batch[0].shape == (2, 64, 64, 6)
    assert batch[1].shape == (2, 64, 64, 1)
    p.close()


def test_unfolding_and_fusion_datasets(tmp_path):
    from sstem_tpu.data.providers import (
        AugConfig, FusionTrainDataset, UnfoldingTrainDataset,
    )

    root = str(tmp_path / "tree")
    write_triplet_tree(root, n_triplets=2, size=440, seed=1)
    # interp list: reuse the middle section as a stand-in interp image
    with open(f"{root}/train_data.txt") as f:
        rows = [r.split() for r in f.read().splitlines()]
    with open(f"{root}/interp_train_data.txt", "w") as f:
        f.write("\n".join(r[1] for r in rows) + "\n")

    ds = UnfoldingTrainDataset(root, "train_data.txt", "interp_train_data.txt",
                               crop_size=400, det_size=256)
    im, lb = ds.sample(np.random.default_rng(2))
    assert im.shape == (256, 256, 6) and lb.shape == (256, 256, 2)

    ds2 = FusionTrainDataset(root, "train_data.txt", "interp_train_data.txt",
                             crop_size=400, det_size=256, gt_line=True)
    im2, lb2 = ds2.sample(np.random.default_rng(3))
    assert im2.shape == (256, 256, 6) and lb2.shape == (256, 256, 1)


def test_sp_dataset(tmp_path):
    from PIL import Image

    from sstem_tpu.data.providers import SPDataset, write_sp_txt

    root = str(tmp_path) + "/"
    stack = synth_stack(4, 128, 128, seed=4)
    for i in (1,):
        stem = f"{i:04d}"
        names = [f"{stem}_1.png", f"{stem}_2.png", f"{stem}_2_degra.png",
                 f"{stem}_3.png", f"{stem}_3_degra.png", f"{stem}_4.png",
                 f"{stem}_2_degra_maska.png", f"{stem}_3_degra_maska.png",
                 f"{stem}_2_degra_maskb.png", f"{stem}_3_degra_maskb.png",
                 f"{stem}_2_interp.png", f"{stem}_3_interp.png"]
        for j, n in enumerate(names):
            Image.fromarray(stack[j % 4]).save(root + n)
    write_sp_txt(root, 1)

    ds = SPDataset(root, root + "sp_train_data.txt", patch_size=64)
    batch = ds.sample(np.random.default_rng(5))
    assert set(batch) >= {"img_1", "img_2_degra", "img_2_degraB1_mask_gradall_r"}
    assert batch["img_1"].shape == (64, 64, 1)
    # reversed masks complement originals
    s = batch["img_2_degraB1_mask_gradall"] + batch["img_2_degraB1_mask_gradall_r"]
    np.testing.assert_allclose(s, 1.0, atol=1 / 255 + 1e-6)


def test_validset_builder_and_epe_loop(tmp_path):
    """Generated valid set loads through UnfoldingValidDataset and drives the
    EPE validation loop."""
    import jax

    from sstem_tpu.cli._sff import epe_valid_loop
    from sstem_tpu.data.providers import UnfoldingValidDataset
    from sstem_tpu.data.validset import make_unfolding_validset
    from sstem_tpu.models import FusionNet

    root = str(tmp_path / "tree")
    write_triplet_tree(root, n_triplets=2, size=160, seed=13)
    with open(f"{root}/train_data.txt") as f:
        rows = [r.split() for r in f.read().splitlines()]

    out = str(tmp_path / "valid")
    made = make_unfolding_validset(root, out, rows, crop=100, det=64, seed=1)
    assert len(made) == 2

    ds = UnfoldingValidDataset(out, "unfolding_valid.txt")
    im, flow2 = ds[0]
    assert im.shape == (64, 64, 6) and flow2.shape == (64, 64, 2)

    model = FusionNet(output_nc=2, ngf=4)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.asarray(im[None]))
    eval_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    epe = epe_valid_loop(eval_fn, variables, ds)
    assert np.isfinite(epe) and epe >= 0


def test_device_degradation_distributional_parity():
    """Host and device SFF degradation produce comparable fold statistics
    (distributional, not bitwise — different RNGs by design, SURVEY §7)."""
    from sstem_tpu.data.sim_sff import degrade_sff, degrade_sff_batch_jax

    img = synth_stack(1, 200, 200, seed=17)[0]
    host_zero, host_mag = [], []
    rng = np.random.default_rng(3)
    for _ in range(6):
        d = degrade_sff(img, rng, det_size=128, line_width_range=(5, 30))
        host_zero.append((d["degraded"] == 0).mean())
        m = np.linalg.norm(d["flow2"], axis=-1)
        host_mag.append(m[m > 0].mean() if (m > 0).any() else 0.0)

    imgs = jnp.asarray(np.repeat(img[None], 6, 0).astype(np.float32))
    deg, flow2 = degrade_sff_batch_jax(
        imgs, jax.random.PRNGKey(5), det_size=128, candidates=4,
        line_width_range=(5, 30),
    )
    deg = np.asarray(deg)
    flow2 = np.asarray(flow2)
    dev_zero = [(deg[b] == 0).mean() for b in range(6)]
    dev_mag = []
    for b in range(6):
        m = np.linalg.norm(flow2[b], axis=-1)
        dev_mag.append(m[m > 0].mean() if (m > 0).any() else 0.0)

    # same order of magnitude of fold coverage and displacement
    assert 0.2 < np.mean(dev_zero) / max(np.mean(host_zero), 1e-6) < 5.0
    assert 0.2 < np.mean(dev_mag) / max(np.mean(host_mag), 1e-6) < 5.0


def _import_ref_scaled_contour():
    """Import the reference's simu_sp/scaled_contour.py as a module."""
    import importlib.util
    import sys
    import types

    # the module imports skimage.io / PIL at top level but the functions
    # under test never use them; stub whatever is absent from this image
    for name, sub in (("skimage", "io"), ("PIL", "Image")):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                pkg = types.ModuleType(name)
                setattr(pkg, sub, types.ModuleType(f"{name}.{sub}"))
                sys.modules[name] = pkg
                sys.modules[f"{name}.{sub}"] = getattr(pkg, sub)

    path = "/root/reference/simu_sp/scaled_contour.py"
    spec = importlib.util.spec_from_file_location("ref_scaled_contour", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scaled_ring_variants_match_reference():
    """The three multiscale ring variants are bit-exact vs the live reference
    functions (simu_sp/scaled_contour.py:90-293), including the dead
    refine variant's identically-zero output."""
    from sstem_tpu.data.sim_sp import (
        refine_ring_outlined, scaled_ring, scaled_ring_outlined)

    ref = _import_ref_scaled_contour()
    for seed in (0, 3, 11):
        mask = synth_blob_mask(256, 256, seed=seed, n_blobs=2)
        # sub-unit scales exercise the float success path; >1 scales the
        # uint8 shape-check failure path (both reference behaviors)
        for s1, s2 in ((0.95, 0.8), (0.9, 0.5), (0.7, 0.3), (1.3, 0.7)):
            got = scaled_ring_outlined(mask, s1, s2)
            want = ref.scaled_contour_multiscale(mask, s1, s2)
            assert got.dtype == want.dtype and got.shape == want.shape
            np.testing.assert_array_equal(got, want)

            got_r = refine_ring_outlined(mask, s1, s2)
            want_r = ref.refine_contour_multiscale(mask, s1, s2)
            assert got_r.dtype == want_r.dtype
            np.testing.assert_array_equal(got_r, want_r)
            assert not got_r.any()  # faithfully dead: always zero

            got_s = scaled_ring(mask, s1, s2)
            want_s = ref.scaled_contour_multiscale_simplify(mask, s1, s2)
            if isinstance(want_s, np.ndarray) and want_s.shape == got_s.shape:
                np.testing.assert_allclose(got_s, want_s)
