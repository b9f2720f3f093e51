"""Driver-contract tests for __graft_entry__.

The build driver invokes the hooks from a FRESH interpreter with the repo's
default environment (axon TPU plugin on PYTHONPATH, no XLA_FLAGS), i.e.::

    python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

Round 1 shipped this broken because no test replicated that invocation — the
in-process pytest mesh (conftest XLA_FLAGS) hid the missing device-count flag.
These tests run the hooks exactly as the driver does.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _driver_env():
    """The driver's environment: no XLA_FLAGS, repo importable, plugin kept."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_dryrun_multichip_as_driver_invokes_it():
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(), cwd=REPO, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_with_backend_already_initialized():
    """Subprocess-fallback path: jax backend is live before the call."""
    code = (
        "import jax; jax.devices(); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(), cwd=REPO, capture_output=True, text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip OK" in proc.stdout


def test_entry_returns_jittable_forward():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 3  # (batch, seq, vocab)


def test_bench_contract_shape():
    """bench.py must print exactly one JSON line with the driver's keys."""
    src = (REPO / "bench.py").read_text()
    for key in ('"metric"', '"value"', '"unit"', '"vs_baseline"'):
        assert key in src
