"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU paths are covered by
bench.py / __graft_entry__.py on hardware.
"""

import os

# Hard override: the ambient environment may point JAX at a TPU tunnel
# (JAX_PLATFORMS=axon); tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
