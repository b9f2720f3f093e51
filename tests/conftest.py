"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE any test module
imports jax, so sharding/pjit tests exercise a realistic multi-device mesh
without TPU hardware. Note: this environment pins JAX_PLATFORMS=axon (the TPU
tunnel) and ignores env-var overrides, so the platform is forced through
jax.config instead. Model tests use tiny configs; Pallas kernels run in
interpret mode on CPU.
"""

import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("VTX_TEST_PLATFORM", "cpu"))

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy sweep variants; run with VTX_RUN_SLOW=1 "
        "(a fast smoke of every slow path stays in the default suite)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("VTX_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow sweep variant; set VTX_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
