"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests exercise the same sharded code paths that run on a TPU pod slice; the
driver separately compile-checks the multi-chip path (see __graft_entry__.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
