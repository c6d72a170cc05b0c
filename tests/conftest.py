"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (multi-chip logic is validated on a host
mesh, per SURVEY.md section 4).

NOTE: this machine's sitecustomize imports jax at interpreter startup and
the environment pins JAX_PLATFORMS to a remote-TPU tunnel, so env vars set
here are too late; instead we rely on backends initializing lazily and
override through jax.config before any device is touched."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
