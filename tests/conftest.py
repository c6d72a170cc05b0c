"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (multi-chip logic is validated on a host mesh,
per SURVEY.md section 4)."""
import os

# Force override: the machine environment pre-sets JAX_PLATFORMS to the
# remote-TPU tunnel, which would route every test dispatch over the network.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
