"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Environment variables must be set before jax is imported anywhere, so this
conftest is the first import of the test session. Multi-chip sharding tests
use the 8 virtual CPU devices (the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip).
"""

import os

# Force, not setdefault: the environment exports JAX_PLATFORMS=axon (TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def golden_dir():
    """Reference golden outputs, when the reference checkout is present."""
    from pathlib import Path

    path = Path("/root/reference/data")
    if not path.exists():
        pytest.skip("reference golden data not available")
    return path
