"""exploreToGround BFS vs the reference-DFS oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from vofod_tpu.geometry import GridSpec
from vofod_tpu.ops.explore import apply_demotions, explore_to_ground

from oracles import explore_to_ground_np

FRONT = -750.0
GROUND = -300.0


def _run(vals, queries, bounds, submap=32):
    grid = GridSpec(origin=(0.0, 0.0, 0.0), shape=vals.shape, voxel_size=0.5)
    q = np.asarray(queries, np.int32)
    connected, reached, corners = explore_to_ground(
        grid,
        jnp.asarray(vals),
        jnp.asarray(q[:, 0]),
        jnp.asarray(q[:, 1]),
        jnp.asarray(q[:, 2]),
        jnp.ones(len(q), bool),
        jnp.asarray(bounds, jnp.int32),
        jnp.float32(FRONT),
        jnp.float32(GROUND),
        submap,
    )
    return np.asarray(connected), np.asarray(reached), np.asarray(corners)


class TestExplore:
    def test_random_fields_match_oracle(self, rng):
        for trial in range(12):
            vals = rng.choice(
                [-1000.0, -740.0, -100.0], p=[0.55, 0.35, 0.10], size=(14, 15, 16)
            ).astype(np.float32)
            qx = rng.integers(1, 15, 6)
            qy = rng.integers(1, 14, 6)
            qz = rng.integers(1, 13, 6)
            bounds = rng.integers(2, 12, 6)
            queries = np.stack([qx, qy, qz], axis=1)
            got_conn, _, _ = _run(vals, queries, bounds)
            for i, (x, y, z) in enumerate(queries):
                want_conn, _ = explore_to_ground_np(
                    vals, (x, y, z), FRONT, GROUND, int(bounds[i])
                )
                assert got_conn[i] == want_conn, (trial, i, (x, y, z), bounds[i])

    def test_floating_cluster_in_cleared_air(self):
        # all air (below frontiers), one unknown voxel at the query: floating
        vals = np.full((12, 12, 12), -1000.0, np.float32)
        vals[6, 6, 6] = -740.0
        conn, reached, _ = _run(vals, [(6, 6, 6)], [8])
        assert not conn[0]
        assert reached[0].sum() == 1  # only the start voxel is unknown

    def test_connected_through_unknown_column(self):
        # unknown column from query down to a ground voxel
        vals = np.full((12, 12, 12), -1000.0, np.float32)
        for z in range(2, 7):
            vals[z, 6, 6] = -740.0
        vals[1, 6, 6] = -100.0  # ground
        conn, _, _ = _run(vals, [(6, 6, 6)], [10])
        assert conn[0]

    def test_shell_touch_is_connected(self):
        # unbroken unknown space: BFS reaches the Manhattan shell -> connected
        vals = np.full((20, 20, 20), -740.0, np.float32)
        conn, _, _ = _run(vals, [(10, 10, 10)], [6])
        assert conn[0]

    def test_grid_edge_start_is_connected(self):
        vals = np.full((8, 8, 8), -1000.0, np.float32)
        conn, _, _ = _run(vals, [(0, 4, 4)], [4])
        assert conn[0]

    def test_demotion_writes_frontiers(self):
        vals = np.full((12, 12, 12), -1000.0, np.float32)
        vals[6, 6, 6] = -740.0
        vals[6, 6, 7] = -740.0
        grid = GridSpec(origin=(0.0, 0.0, 0.0), shape=vals.shape, voxel_size=0.5)
        conn, reached, corners = _run(vals, [(6, 6, 6)], [8])
        assert not conn[0]
        assert reached[0].sum() == 2
        out = np.asarray(
            apply_demotions(
                jnp.asarray(vals),
                jnp.asarray(reached),
                jnp.asarray(corners),
                jnp.ones(1, bool),
                jnp.float32(FRONT),
            )
        )
        assert out[6, 6, 6] == FRONT and out[6, 6, 7] == FRONT
        assert (out == vals).sum() == vals.size - 2
