"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); real-TPU paths are covered by
bench.py / __graft_entry__.py on hardware.

Setting os.environ here is NOT enough: the environment may inject a
sitecustomize (PYTHONPATH=/root/.axon_site) that imports jax and registers
a TPU backend at interpreter startup — before any conftest runs — after
which JAX_PLATFORMS/XLA_FLAGS changes are silently ignored and the "8-device
CPU mesh" is actually one TPU chip.  So if jax is already up on the wrong
platform, re-exec pytest once with a corrected environment (cpu platform,
8 virtual host devices, no preloading PYTHONPATH entries).
"""

import os
import sys

_FLAG = "--xla_force_host_platform_device_count=8"


def _env_ok() -> bool:
    if os.environ.get("JAX_PLATFORMS") != "cpu":
        return False
    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        return False
    if "jax" in sys.modules:
        import jax
        try:
            if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
                return False
        except Exception:
            pass
    return True


if not _env_ok() and not os.environ.get("_CO_TESTS_REEXEC"):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    xla = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                   if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (xla + " " + _FLAG).strip()
    # drop sitecustomize injectors (e.g. the axon TPU tunnel) so a fresh
    # interpreter starts with jax un-imported
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon" not in p]
    if pp:
        env["PYTHONPATH"] = os.pathsep.join(pp)
    else:
        env.pop("PYTHONPATH", None)
    env["_CO_TESTS_REEXEC"] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()

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
