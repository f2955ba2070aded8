"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests exercise the same sharded code paths that run on a TPU pod slice; the
driver separately compile-checks the multi-chip path (see __graft_entry__.py).

Note: the environment may pre-register a tunneled TPU backend via
sitecustomize; forcing the platform through jax.config (before any backend is
instantiated) overrides it reliably.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    """Build the native library if missing (the .so is not committed)."""
    import pathlib
    import subprocess

    native = pathlib.Path(__file__).resolve().parent.parent / "native"
    if not (native / "libvofod_native.so").exists():
        try:
            subprocess.run(["make", "-C", str(native)], check=True, timeout=120)
        except Exception as e:  # tests using the lib will fall back / fail loudly
            print(f"[conftest] native build failed: {e}")
