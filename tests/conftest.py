"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU paths are covered by
bench.py / __graft_entry__.py on hardware.

Setting os.environ here is NOT enough: the environment may inject a
sitecustomize (PYTHONPATH=/root/.axon_site) that imports jax and registers
a TPU backend at interpreter startup — before any conftest runs — after
which JAX_PLATFORMS/XLA_FLAGS env changes are silently ignored and the
"8-device CPU mesh" is actually one TPU chip.  (A conftest re-exec is no
fix either: pytest's fd-level capture is already active, so the child's
output lands in a deleted tempfile.)  So when jax is already up on the
wrong platform, switch it in-process: update jax_platforms, then reset the
backend cache so the CPU client is created fresh under the forced
device-count flag.
"""

import os
import sys

_FLAG = "--xla_force_host_platform_device_count=8"

os.environ["JAX_PLATFORMS"] = "cpu"
_xla = " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in f)
os.environ["XLA_FLAGS"] = (_xla + " " + _FLAG).strip()

if "jax" in sys.modules:
    import jax

    if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
        jax.config.update("jax_platforms", "cpu")
        import jax._src.xla_bridge as xb

        xb._clear_backends()
        # _clear_backends resets the registry but not the get_backend()
        # memo that default_backend()/devices() read through
        xb.get_backend.cache_clear()
        assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    import jax
    assert jax.default_backend() == "cpu", (
        f"tests must run on the virtual CPU mesh, got "
        f"{jax.default_backend()!r}")
    assert len(jax.devices()) >= 8, (
        f"need 8 virtual devices, have {len(jax.devices())}")
    yield
