"""Pallas fused sweep kernel vs the lax.scan reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vofod_tpu.ops.pallas_sweep import pallas_sweep_cones
from vofod_tpu.ops.raycast import _sweep_cones


def _cone_inputs(rng, nS, C, nA, nB, sensor_at=3.2):
    opaq = (rng.random((nS, C, nA, nB)) < 0.05).astype(np.float32)
    # monotone sweep offsets starting behind the sensor (like the real cones)
    rel_s = np.stack(
        [np.arange(nS) + 0.5 - sensor_at - 0.3 * c for c in range(C)], axis=1
    ).astype(np.float32)
    rel_a = np.stack(
        [np.arange(nA) - nA / 2 + 0.2 * c for c in range(C)]
    ).astype(np.float32)
    rel_b = np.stack(
        [np.arange(nB) - nB / 3 + 0.1 * c for c in range(C)]
    ).astype(np.float32)
    return (
        jnp.asarray(opaq),
        jnp.asarray(rel_s),
        jnp.asarray(rel_a),
        jnp.asarray(rel_b),
    )


@pytest.mark.parametrize("shape", [(24, 4, 12, 20), (16, 2, 20, 12)])
def test_kernel_matches_scan(rng, shape):
    nS, C, nA, nB = shape
    opaq, rel_s, rel_a, rel_b = _cone_inputs(rng, nS, C, nA, nB)
    want = np.asarray(_sweep_cones(opaq, rel_s, rel_a, rel_b))
    got = np.asarray(
        pallas_sweep_cones(opaq, rel_s, rel_a, rel_b, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_kernel_matches_scan_with_blockage(rng):
    """Dense blockage so transmittance decays through many attenuations —
    stresses the carry chain, not just the seeding."""
    nS, C, nA, nB = 32, 2, 16, 16
    opaq, rel_s, rel_a, rel_b = _cone_inputs(rng, nS, C, nA, nB)
    opaq = (rng.random((nS, C, nA, nB)) < 0.4).astype(np.float32)
    want = np.asarray(_sweep_cones(jnp.asarray(opaq), rel_s, rel_a, rel_b))
    got = np.asarray(
        pallas_sweep_cones(jnp.asarray(opaq), rel_s, rel_a, rel_b, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
