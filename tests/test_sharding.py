"""Multi-chip path on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.ops.morphology import ball_pool_min
from vofod_tpu.parallel.sharding import (
    halo_ball_pool_min,
    halo_ball_pool_sum,
    halo_propagate_reach,
    init_batched_state,
    make_batched_step,
    make_mesh,
)
from vofod_tpu.pipeline.state import ScanInput
from vofod_tpu.sensor import make_lut


def tiny_config():
    return VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=16, horizontal_rays=64, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 4.0), (16.0, 16.0, 16.0)),
        max_clusters=4,
        max_far_voxels=256,
        max_queries=64,
        explore_submap=16,
    )


class TestDataParallel:
    def test_batched_step_over_mesh(self):
        assert len(jax.devices()) == 8
        cfg = tiny_config()
        dyn = DynParams()
        mesh = make_mesh(8)
        lut = make_lut(cfg.sensor)
        B = 8
        state = init_batched_state(cfg, dyn, B, mesh)
        step = make_batched_step(cfg, lut, mesh)

        scene = Scene(ground_z=0.0)
        pose = hover_pose((0.0, 0.0, 3.0))
        ranges = render_scan(scene, lut, pose)
        scans = ScanInput(
            ranges_mm=jnp.broadcast_to(
                jnp.asarray(ranges.astype(np.float32)), (B, ranges.size)
            ),
            intensity=jnp.ones((B, ranges.size), jnp.float32),
            pose=jnp.broadcast_to(jnp.asarray(pose), (B, 4, 4)),
        )
        for _ in range(2):
            state, out = step(state, scans, dyn.as_arrays())
        assert state.grid.shape[0] == B
        assert int(state.step[0]) == 2
        # all streams identical inputs -> identical diagnostics
        occ = np.asarray(out.diag.n_occupied)
        assert (occ == occ[0]).all() and occ[0] > 0
        # state really is sharded over the mesh
        assert len(state.grid.sharding.device_set) == 8

    def test_streams_independent_and_match_single_stream(self):
        """Heterogeneous scans per stream: every stream advances its own step
        count and produces bit-identical state to running the plain
        single-stream step — the shard_map + per-shard lax.scan design runs
        the UNBATCHED program per stream by construction."""
        from vofod_tpu.pipeline.state import init_state
        from vofod_tpu.pipeline.step import make_step_fn

        cfg = tiny_config()
        dyn = DynParams()
        mesh = make_mesh(8)
        lut = make_lut(cfg.sensor)
        B = 8
        pose = hover_pose((0.0, 0.0, 3.0))
        empty = render_scan(Scene(ground_z=0.0), lut, pose)
        tgt_scene = Scene(ground_z=0.0)
        tgt_scene.add_sphere(center=(5.0, 0.0, 6.0), radius=0.6)
        tgt = render_scan(tgt_scene, lut, pose)
        per_stream = np.stack([tgt if b % 2 else empty for b in range(B)])

        state = init_batched_state(cfg, dyn, B, mesh)
        step = make_batched_step(cfg, lut, mesh)
        scans = ScanInput(
            ranges_mm=jnp.asarray(per_stream.astype(np.float32)),
            intensity=jnp.ones((B, per_stream.shape[1]), jnp.float32),
            pose=jnp.broadcast_to(jnp.asarray(pose), (B, 4, 4)),
        )
        for _ in range(3):
            state, out = step(state, scans, dyn.as_arrays())
        # per-stream step counters all advanced
        np.testing.assert_array_equal(np.asarray(state.step), np.full(B, 3))
        # single-stream reference runs (streams 0 and 1 cover both scenes)
        sstep = make_step_fn(cfg, lut, donate=False)
        for b in (0, 1):
            st = init_state(cfg, dyn)
            sc = ScanInput(
                ranges_mm=jnp.asarray(per_stream[b].astype(np.float32)),
                intensity=jnp.ones((per_stream.shape[1],), jnp.float32),
                pose=jnp.asarray(pose),
            )
            for _ in range(3):
                st, _ = sstep(st, sc, dyn.as_arrays())
            np.testing.assert_array_equal(
                np.asarray(state.grid[b]), np.asarray(st.grid)
            )

    def test_batch_not_divisible_raises(self):
        cfg = tiny_config()
        mesh = make_mesh(8)
        lut = make_lut(cfg.sensor)
        dyn = DynParams()
        state = init_batched_state(cfg, dyn, 8, mesh)
        step = make_batched_step(cfg, lut, mesh)
        bad = jax.tree.map(lambda x: x[:6], state)
        scans = ScanInput(
            ranges_mm=jnp.zeros((6, cfg.sensor.n_points), jnp.float32),
            intensity=jnp.ones((6, cfg.sensor.n_points), jnp.float32),
            pose=jnp.broadcast_to(jnp.eye(4), (6, 4, 4)),
        )
        with pytest.raises(ValueError, match="divisible"):
            step(bad, scans, dyn.as_arrays())


class TestGridSharding:
    @pytest.mark.parametrize("radius", [1.6, 3.0])
    def test_halo_pool_matches_unsharded(self, rng, radius):
        mesh = make_mesh(8)
        a = rng.integers(0, 10_000, size=(64, 24, 24)).astype(np.int32)
        got = np.asarray(halo_ball_pool_min(jnp.asarray(a), radius, mesh))
        want = np.asarray(ball_pool_min(jnp.asarray(a), radius))
        np.testing.assert_array_equal(got, want)

    def test_halo_sum_matches_unsharded(self, rng):
        from vofod_tpu.ops.morphology import ball_pool_sum

        mesh = make_mesh(8)
        a = (rng.random((64, 16, 16)) < 0.2).astype(np.int32)
        got = np.asarray(halo_ball_pool_sum(jnp.asarray(a), 2.0, mesh))
        want = np.asarray(ball_pool_sum(jnp.asarray(a), 2.0))
        np.testing.assert_array_equal(got, want)

    def test_halo_propagate_matches_unsharded(self, rng):
        from vofod_tpu.ops.components import propagate_reach

        mesh = make_mesh(8)
        occ = rng.random((32, 16, 16)) < 0.12
        seed = (rng.random((32, 16, 16)) < 0.02) & occ
        got = np.asarray(
            halo_propagate_reach(
                jnp.asarray(occ), jnp.asarray(seed), 3.0, 10, mesh
            )
        )
        want = np.asarray(
            propagate_reach(jnp.asarray(occ), jnp.asarray(seed), 3.0, 64)[0]
        )
        np.testing.assert_array_equal(got, want)
