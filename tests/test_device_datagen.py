"""On-device degradation training path + debug utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

RNG = np.random.default_rng(51)


@pytest.fixture(autouse=True)
def _fast_precision():
    import sstem_tpu.config as cfg

    cfg.set_matmul_precision("default")
    yield
    cfg.set_matmul_precision("highest")


def test_device_datagen_step_runs_and_learns():
    from sstem_tpu.data.synthetic import synth_stack
    from sstem_tpu.models import FusionNet
    from sstem_tpu.train.device_datagen import make_device_datagen_step
    from sstem_tpu.train.trainer import TrainState, make_optimizer

    model = FusionNet(output_nc=2, ngf=4)
    opt = make_optimizer(lambda s: 1e-3)
    step = make_device_datagen_step(
        model, opt, det_size=64, candidates=2, line_width_range=(5, 20)
    )

    clean = jnp.asarray(
        synth_stack(2, 100, 100, seed=7).astype(np.float32)
    )
    interp = clean  # stand-in interp images

    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.float32)
    )
    state = TrainState.create(variables["params"], opt,
                              batch_stats=variables["batch_stats"])
    losses_seen = []
    for i in range(3):
        state, m = step(state, (clean, interp, jnp.asarray(i)))
        losses_seen.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses_seen)
    assert int(state.step) == 3


def test_device_datagen_randomizes_per_step():
    """Different step indices must produce different degradations."""
    from sstem_tpu.data.sim_sff import degrade_sff_batch_jax
    from sstem_tpu.data.synthetic import synth_stack

    clean = jnp.asarray(synth_stack(1, 100, 100, seed=8).astype(np.float32))
    d1, f1 = degrade_sff_batch_jax(clean, jax.random.PRNGKey(1), det_size=64,
                                   candidates=2)
    d2, f2 = degrade_sff_batch_jax(clean, jax.random.PRNGKey(2), det_size=64,
                                   candidates=2)
    assert float(jnp.abs(f1 - f2).max()) > 0


def test_sample_pool_crops_contents_and_dihedral():
    """Every sampled crop must be a dihedral transform of an actual window
    of one pool image; the draw is deterministic in the key."""
    from sstem_tpu.train.device_datagen import sample_pool_crops

    rng = np.random.default_rng(3)
    pool = rng.integers(0, 255, (3, 2, 24, 24), np.uint8)
    key = jax.random.PRNGKey(5)
    crops = np.asarray(sample_pool_crops(jnp.asarray(pool), key, 4, 8))
    assert crops.shape == (4, 2, 8, 8)
    crops2 = np.asarray(sample_pool_crops(jnp.asarray(pool), key, 4, 8))
    np.testing.assert_array_equal(crops, crops2)

    def dihedral_variants(win):
        for k in range(4):
            r = np.rot90(win, k, axes=(-2, -1))
            yield r
            yield np.flip(r, axis=-1)

    for b in range(4):
        found = False
        for n in range(pool.shape[0]):
            img = pool[n].astype(np.float32)
            for oy in range(24 - 8 + 1):
                for ox in range(24 - 8 + 1):
                    win = img[:, oy:oy + 8, ox:ox + 8]
                    for v in dihedral_variants(win):
                        if np.array_equal(v, crops[b]):
                            found = True
        assert found, f"crop {b} is not a dihedral window of the pool"


def test_pool_step_runs_and_counter_provider():
    """Pool-sampled unfolding step: one scalar input, finite loss,
    advancing state; CounterProvider yields successive counters."""
    from sstem_tpu.data.synthetic import synth_stack
    from sstem_tpu.models import FusionNet
    from sstem_tpu.train.device_datagen import (
        CounterProvider, make_device_datagen_loss, make_pool_step)
    from sstem_tpu.train.trainer import TrainState, make_optimizer

    model = FusionNet(output_nc=2, ngf=4)
    opt = make_optimizer(lambda s: 1e-3)
    imgs = synth_stack(4, 100, 100, seed=9)
    pool = np.stack([imgs[:2], imgs[2:]], axis=1)  # (2, 2, 100, 100)
    step = make_pool_step(
        make_device_datagen_loss(model, det_size=64, candidates=2), opt,
        pool, batch=2, crop=100)

    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.float32))
    state = TrainState.create(variables["params"], opt,
                              batch_stats=variables["batch_stats"])
    provider = CounterProvider(start_iter=5)
    c = provider.next()
    assert int(c) == 6
    state, m = step(state, c)
    state, m2 = step(state, provider.next())
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m["loss"]) != float(m2["loss"])  # fresh draws per step
    assert int(state.step) == 2


def test_pool_interp_step_learns():
    """On-device triplet sampling: interp loss decreases over a few steps
    on constant images (the KPN can trivially average neighbors)."""
    from sstem_tpu.models import IFNet
    from sstem_tpu.train.device_datagen import make_pool_interp_step
    from sstem_tpu.train.trainer import TrainState, make_optimizer

    rng = np.random.default_rng(11)
    base = rng.integers(40, 200, (4, 1, 72, 72), np.uint8)
    pool = np.repeat(base, 3, axis=1)  # identical frames -> learnable
    model = IFNet(kernel_size=5, n_frames=1)
    opt = make_optimizer(lambda s: 1e-3)
    step = make_pool_interp_step(model, opt, pool, batch=2, crop=64)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6), jnp.float32))
    state = TrainState.create(variables["params"], opt)
    first = last = None
    for i in range(8):
        state, m = step(state, jnp.asarray(i, jnp.int32))
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert np.isfinite(last) and last < first


def test_step_timer():
    from sstem_tpu.utils.debug import StepTimer

    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    rep = t.report()
    assert rep["a"]["total_s"] >= 0 and "mean_s" in rep["a"]
