"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference has no tests at all (SURVEY.md §4); we build the pyramid here.
Multi-device behavior is tested without hardware by forcing the host platform
to expose 8 virtual CPU devices, per the standard JAX testing recipe.
"""

import os

# Force CPU with 8 virtual devices even when the ambient environment
# preselects a TPU platform (e.g. a preregistered PJRT plugin): the suite is
# designed around an 8-virtual-device CPU mesh; TPU-only tests carry the
# `tpu` marker and are exercised separately on hardware. The config updates
# below override platform selection even if a site hook already imported jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: repeat pytest runs skip recompiles.
# Backend-specific dir: a CPU artifact once loaded with mismatched host
# machine features (SIGILL risk) when sharing a dir with remote-compiled
# artifacts, so the CPU suite keeps its own cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/sstem_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip_tpu = pytest.mark.skip(reason="requires real TPU hardware")
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)
