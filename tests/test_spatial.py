"""Spatial shard_map halo-exchange tests on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sstem_tpu.parallel.mesh import make_mesh
from sstem_tpu.parallel.spatial import spatial_apply

RNG = np.random.default_rng(61)


@pytest.fixture(autouse=True)
def _fast_precision():
    import sstem_tpu.config as cfg

    cfg.set_matmul_precision("default")
    yield
    cfg.set_matmul_precision("highest")


def test_spatial_conv_matches_single_device():
    from flax import linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(4, (3, 3), padding="SAME")(x))
            return nn.Conv(1, (3, 3), padding="SAME")(x)

    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=1, n_space=8)
    m = Net()
    x = jnp.asarray(RNG.standard_normal((2, 64, 48, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    apply_fn = lambda xx: m.apply(v, xx)

    # canvas semantics: full pass over the zero-extended image, cropped
    canvas = jnp.pad(x, [(0, 0), (8, 8), (0, 0), (0, 0)])
    full = apply_fn(canvas)[:, 8:-8]
    sharded = spatial_apply(apply_fn, x, mesh, halo=8)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    # interior rows also match the raw-image pass (border effects are
    # confined to the receptive-field margin)
    raw = apply_fn(x)
    np.testing.assert_allclose(np.asarray(sharded)[:, 4:-4],
                               np.asarray(raw)[:, 4:-4],
                               rtol=1e-5, atol=1e-5)


def test_spatial_sepconv_style_window_op():
    """A windowed mean op (halo-dependent) is exact under the sharding."""
    def box5(x):
        from jax import lax

        k = jnp.ones((5, 5, 1, 1), jnp.float32) / 25.0
        return lax.conv_general_dilated(
            x, k, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    mesh = make_mesh(n_data=1, n_space=4)
    x = jnp.asarray(RNG.standard_normal((1, 32, 32, 1)), jnp.float32)
    # single linear window op: canvas and raw semantics coincide
    full = box5(x)
    sharded = spatial_apply(box5, x, mesh, halo=8)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full),
                               rtol=1e-5, atol=1e-6)
