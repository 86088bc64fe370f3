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


def test_step_timer():
    from sstem_tpu.utils.debug import StepTimer

    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    rep = t.report()
    assert rep["a"]["total_s"] >= 0 and "mean_s" in rep["a"]
