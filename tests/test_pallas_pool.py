"""Pallas ball-pool kernel vs the XLA decomposition (interpret mode on CPU;
the compiled path is exercised on TPU via VOFOD_PALLAS_POOL=1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vofod_tpu.ops.morphology import _ball_pool
from vofod_tpu.ops.pallas_pool import pallas_ball_pool


@pytest.mark.parametrize(
    "op,fill,comb",
    [
        ("min", float("inf"), jnp.minimum),
        ("max", float("-inf"), jnp.maximum),
    ],
)
def test_pallas_pool_matches_decomposition(rng, op, fill, comb):
    a = rng.normal(size=(13, 21, 37)).astype(np.float32)
    got = np.asarray(
        pallas_ball_pool(jnp.asarray(a), 3.0, op, fill, interpret=True)
    )
    want = np.asarray(_ball_pool(jnp.asarray(a), 3.0, comb, fill))
    np.testing.assert_array_equal(got, want)


def test_pallas_pool_int_sum(rng):
    a = rng.integers(0, 5, size=(9, 17, 33)).astype(np.int32)
    got = np.asarray(pallas_ball_pool(jnp.asarray(a), 2.0, "sum", 0, interpret=True))
    want = np.asarray(_ball_pool(jnp.asarray(a), 2.0, jnp.add, 0))
    np.testing.assert_array_equal(got, want)
