"""Test harness configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax is imported
anywhere, so sharding/pjit tests exercise a realistic multi-device mesh
without TPU hardware. Model tests use tiny configs; Pallas kernels run in
interpret mode on CPU.
"""

import os
import sys
from pathlib import Path

# Must be set before any jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
