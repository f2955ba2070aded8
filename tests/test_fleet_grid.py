"""2D-mesh composition (parallel/grid_step.make_fleet_grid_step): N
data-parallel sensor streams, each stream's grid Z-sharded — both scaling
axes in one shard_map.

Per-stream results must be BIT-identical to the dense unsharded step on the
grids (the ZShardOps construction feeds every element the same operands in
the same order; see tests/test_grid_step.py) and last-ulp-equal on the
detection floats (sharded/unsharded programs fuse the small per-cluster
reductions differently).  The reference has no analogue surface — it holds
one VoxelMap on one machine (vofod_nodelet.cpp, mutex'd) — so the contract
here is purely internal consistency with the 1D paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_grid_step import sharded_config
from vofod_tpu.config import Box, DynParams
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.parallel.grid_step import (
    init_fleet_grid_state,
    make_fleet_grid_mesh,
    make_fleet_grid_step,
)
from vofod_tpu.pipeline.state import ScanInput, init_state
from vofod_tpu.pipeline.step import make_step_fn
from vofod_tpu.sensor import make_lut

N_SCANS = 6
B = 4  # streams: 2 per data shard on the 2x4 mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_fleet_grid_mesh(2, 4)


def _stream_scans(cfg, lut):
    """Per-stream scan sequences: every stream sees the same ground, but its
    own target (different positions, different appearance scans) — the
    detectors must evolve independently."""
    pose = hover_pose((0.0, 0.0, 6.0))
    out = []  # [B][N_SCANS] of (ranges, pose)
    for b in range(B):
        seq = []
        for t in range(N_SCANS):
            scene = Scene(ground_z=0.5)
            if t >= 3 + (b % 2):  # staggered appearance
                scene.add_sphere(
                    center=(4.0 - 0.8 * b, 0.4 * b - 0.6, 9.0), radius=0.7
                )
            seq.append((render_scan(scene, lut, pose), pose))
        out.append(seq)
    return out


def _batched_scan(streams, t):
    ranges = np.stack([streams[b][t][0] for b in range(B)]).astype(np.float32)
    poses = np.stack([streams[b][t][1] for b in range(B)])
    return ScanInput(
        ranges_mm=jnp.asarray(ranges),
        intensity=jnp.ones(ranges.shape, jnp.float32),
        pose=jnp.asarray(poses),
    )


def _single_scan(streams, b, t):
    ranges, pose = streams[b][t]
    return ScanInput(
        ranges_mm=jnp.asarray(ranges.astype(np.float32)),
        intensity=jnp.ones(ranges.size, jnp.float32),
        pose=jnp.asarray(pose),
    )


class TestFleetGridStep:
    def test_bitexact_vs_dense_per_stream(self, mesh):
        cfg = sharded_config()
        dyn = DynParams(raycast_weight_coefficient=0.5)
        lut = make_lut(cfg.sensor)
        streams = _stream_scans(cfg, lut)

        # reference: the dense unsharded step, one detector per stream
        ref_step = make_step_fn(cfg, lut, donate=False)
        ref_states = []
        for b in range(B):
            s = init_state(cfg, dyn)
            ref_states.append(s._replace(grid=s.grid.at[1].set(0.0)))

        fl_step = make_fleet_grid_step(cfg, lut, mesh)
        fl_state = init_fleet_grid_state(cfg, dyn, B, mesh)
        fl_state = fl_state._replace(
            grid=fl_state.grid.at[:, 1].set(0.0)
        )

        n_det = 0
        for t in range(N_SCANS):
            fl_state, fl_out = fl_step(
                fl_state, _batched_scan(streams, t), dyn.as_arrays()
            )
            fl_grid = np.asarray(fl_state.grid)
            fl_safe = np.asarray(fl_state.safe)
            for b in range(B):
                ref_states[b], ref_out = ref_step(
                    ref_states[b], _single_scan(streams, b, t), dyn.as_arrays()
                )
                np.testing.assert_array_equal(
                    fl_grid[b], np.asarray(ref_states[b].grid),
                    err_msg=f"scan {t} stream {b}: grid diverged",
                )
                np.testing.assert_array_equal(
                    fl_safe[b], np.asarray(ref_states[b].safe),
                    err_msg=f"scan {t} stream {b}: safe diverged",
                )
                for name in ref_out.detections._fields:
                    a = np.asarray(getattr(fl_out.detections, name))[b]
                    r = np.asarray(getattr(ref_out.detections, name))
                    if a.dtype.kind == "f":
                        np.testing.assert_allclose(
                            a, r, rtol=1e-5, atol=1e-7,
                            err_msg=f"scan {t} stream {b}: det.{name}",
                        )
                    else:
                        np.testing.assert_array_equal(
                            a, r, err_msg=f"scan {t} stream {b}: det.{name}"
                        )
                n_det += int(jnp.sum(ref_out.detections.valid))
        # non-vacuity: the staggered targets really get detected, and the
        # streams genuinely differ (different appearance scans)
        assert n_det >= 2
        # the state spans ALL 8 devices: 2 stream groups x 4 grid shards
        assert len(fl_state.grid.sharding.device_set) == 8

    def test_prebinned_bitexact_vs_dense_per_stream(self, mesh):
        """The prebinned ingest path under the 2D mesh: per-stream packed
        host-binned grids shard P(data, grid) with the state; results must
        match the dense prebinned step per stream."""
        import jax.numpy as _jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vofod_tpu.io.binner import HostBinner
        from vofod_tpu.pipeline.state import PrebinnedScan

        cfg = sharded_config()
        dyn = DynParams(raycast_weight_coefficient=0.5)
        lut = make_lut(cfg.sensor)
        hb = HostBinner(cfg, lut)
        streams = _stream_scans(cfg, lut)
        n_scans = 4

        ref_step = make_step_fn(
            cfg, lut, donate=False, frontend_mode="prebinned"
        )
        ref_states = []
        for b in range(B):
            s = init_state(cfg, dyn)
            ref_states.append(s._replace(grid=s.grid.at[1].set(0.0)))

        fl_step = make_fleet_grid_step(
            cfg, lut, mesh, frontend_mode="prebinned"
        )
        fl_state = init_fleet_grid_state(cfg, dyn, B, mesh)
        fl_state = fl_state._replace(grid=fl_state.grid.at[:, 1].set(0.0))
        pspec = NamedSharding(mesh, P("data", "grid", None, None))
        dspec = NamedSharding(mesh, P("data"))

        for t in range(n_scans):
            bins = [
                hb.bin(streams[b][t][0], streams[b][t][1]).to_device()
                for b in range(B)
            ]
            batched = PrebinnedScan(
                packed=jax.device_put(
                    _jnp.stack([sc.packed for sc in bins]), pspec
                ),
                active=jax.device_put(
                    _jnp.stack([sc.active for sc in bins]), dspec
                ),
                pose=jax.device_put(
                    _jnp.stack([sc.pose for sc in bins]), dspec
                ),
                stats=jax.device_put(
                    _jnp.stack([sc.stats for sc in bins]), dspec
                ),
            )
            fl_state, fl_out = fl_step(fl_state, batched, dyn.as_arrays())
            fl_grid = np.asarray(fl_state.grid)
            for b in range(B):
                ref_states[b], ref_out = ref_step(
                    ref_states[b], bins[b], dyn.as_arrays()
                )
                np.testing.assert_array_equal(
                    fl_grid[b], np.asarray(ref_states[b].grid),
                    err_msg=f"scan {t} stream {b}: grid diverged",
                )
                np.testing.assert_array_equal(
                    np.asarray(fl_out.detections.valid)[b],
                    np.asarray(ref_out.detections.valid),
                    err_msg=f"scan {t} stream {b}: detections diverged",
                )

    def test_diverging_schedule_lockstep(self, mesh):
        """Stream groups whose stage-cond predicates DIVERGE must neither
        hang the grid-axis collective rendezvous nor perturb results.

        Two real divergence sources, both exercised here: ``do_ray`` is
        per-stream via in_limits(sensor_pos) — group 1's sensors fly OUT of
        the operation area on odd scans while group 0 keeps raycasting —
        and ``run_sep`` is per-stream via the step counter — group 1 starts
        from a later counter (a resumed checkpoint), so sepclusters fires
        on different ticks per group.  Without routing both conds through
        ctrl_any + local-predicate masking (pipeline/step.py), group 0
        would issue its with_ray/with_sep halo collectives while group 1
        skips them — the rendezvous mismatch DESIGN.md §6 documents.
        Results must stay bit-equal per stream to the dense step."""
        cfg = sharded_config(sepclusters_every=8)  # > N_SCANS: group 0
        # fires sepclusters at t=0 only; group 1 (counter 6) at t=2 only
        dyn = DynParams(raycast_weight_coefficient=0.5)
        lut = make_lut(cfg.sensor)
        streams = _stream_scans(cfg, lut)
        far_pose = hover_pose((-40.0, 0.0, 6.0))  # outside the oparea
        for b in (2, 3):  # data row 1: sensor leaves the area on odd scans
            streams[b] = [
                (render_scan(Scene(ground_z=0.5), lut, far_pose), far_pose)
                if t % 2 == 1
                else streams[b][t]
                for t in range(N_SCANS)
            ]
        step0 = [0, 0, cfg.sepclusters_every - 2, cfg.sepclusters_every - 2]

        ref_step = make_step_fn(cfg, lut, donate=False)
        ref_states = []
        for b in range(B):
            s = init_state(cfg, dyn)
            ref_states.append(
                s._replace(
                    grid=s.grid.at[1].set(0.0),
                    step=jnp.int32(step0[b]),
                )
            )

        fl_step = make_fleet_grid_step(cfg, lut, mesh)
        fl_state = init_fleet_grid_state(cfg, dyn, B, mesh)
        fl_state = fl_state._replace(
            grid=fl_state.grid.at[:, 1].set(0.0),
            step=jax.device_put(
                jnp.asarray(step0, jnp.int32), fl_state.step.sharding
            ),
        )

        for t in range(N_SCANS):
            fl_state, fl_out = fl_step(
                fl_state, _batched_scan(streams, t), dyn.as_arrays()
            )
            fl_grid = np.asarray(fl_state.grid)
            fl_safe = np.asarray(fl_state.safe)
            for b in range(B):
                ref_states[b], ref_out = ref_step(
                    ref_states[b], _single_scan(streams, b, t), dyn.as_arrays()
                )
                np.testing.assert_array_equal(
                    fl_grid[b], np.asarray(ref_states[b].grid),
                    err_msg=f"scan {t} stream {b}: grid diverged",
                )
                np.testing.assert_array_equal(
                    fl_safe[b], np.asarray(ref_states[b].safe),
                    err_msg=f"scan {t} stream {b}: safe diverged",
                )
                np.testing.assert_array_equal(
                    np.asarray(fl_out.detections.valid)[b],
                    np.asarray(ref_out.detections.valid),
                    err_msg=f"scan {t} stream {b}: detections diverged",
                )
        # non-vacuity: the two groups really took different branches —
        # group 0 fires sepclusters at t=0 (counter 0), group 1 at t=2
        # (counter 8) — never on the same tick within this run
        assert step0[0] % cfg.sepclusters_every == 0
        assert step0[2] % cfg.sepclusters_every != 0
        assert (step0[2] + N_SCANS) > cfg.sepclusters_every >= N_SCANS

    def test_batch_indivisible_raises(self, mesh):
        cfg = sharded_config()
        dyn = DynParams()
        lut = make_lut(cfg.sensor)
        step = make_fleet_grid_step(cfg, lut, mesh)
        state = init_fleet_grid_state(cfg, dyn, B, mesh)
        scene = Scene(ground_z=0.5)
        pose = hover_pose((0.0, 0.0, 6.0))
        r = render_scan(scene, lut, pose).astype(np.float32)
        bad = ScanInput(  # B=3 not divisible by the 2-wide data axis
            ranges_mm=jnp.asarray(np.stack([r] * 3)),
            intensity=jnp.ones((3, r.size), jnp.float32),
            pose=jnp.asarray(np.stack([pose] * 3)),
        )
        with pytest.raises(ValueError, match="divisible"):
            step(state, bad, dyn.as_arrays())

    def test_mesh_needs_enough_devices(self):
        with pytest.raises(ValueError, match="devices"):
            make_fleet_grid_mesh(4, 4)

    def test_fleet_runtime_grid_shards(self):
        """FleetVoFOD(grid_shards=4): the user-facing wrapper over the 2D
        composition — end-to-end detections per stream, apriori stamping on
        the 2D-sharded grid, and the multi-host fetch path deduplicating the
        grid-replicated detection shards."""
        from vofod_tpu.config import SensorConfig, VoFODConfig
        from vofod_tpu.runtime.fleet import FleetVoFOD

        cfg = VoFODConfig(
            sensor=SensorConfig(
                vertical_rays=24, horizontal_rays=128,
                vertical_fov=np.deg2rad(90.0),
            ),
            # z size 15.5 -> nz = 32, divisible by the 4 grid shards
            oparea=Box((0.0, 0.0, 3.75), (30.0, 30.0, 15.5)),
            background_sufficient_points_ratio=0.05,
            max_clusters=8,
            max_far_voxels=512,
            max_queries=64,
            explore_submap=16,
            confidence_submap=8,
        )
        fleet = FleetVoFOD(cfg, DynParams(), n_streams=2, grid_shards=4)
        assert dict(fleet.mesh.shape) == {"data": 2, "grid": 4}
        assert len(fleet.state.grid.sharding.device_set) == 8

        xs = np.arange(-5.0, 5.0, 0.4)
        gx, gy = np.meshgrid(xs, xs)
        fleet.load_apriori_map(
            np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
        )
        pose = hover_pose((0.0, 0.0, 3.0))
        lut = fleet.lut
        empty = render_scan(Scene(ground_z=0.0), lut, pose)
        sc = Scene(ground_z=0.0)
        sc.add_sphere(center=(6.0, 0.0, 5.0), radius=0.5)
        tgt = render_scan(sc, lut, pose)
        poses = np.tile(pose, (2, 1, 1))
        for _ in range(40):
            fleet.process_scans(np.tile(empty, (2, 1)), poses)
        mixed = np.stack([tgt, empty])
        msgs = None
        for _ in range(4):
            msgs = fleet.process_scans(mixed, poses)
        assert len(msgs[0].detections) == 1
        pos = np.array(msgs[0].detections[0].position)
        assert np.linalg.norm(pos - [6.0, 0.0, 5.0]) < 1.0
        assert len(msgs[1].detections) == 0

        # multi-host fetch path: grid-replicated rows must come back once
        assert fleet.local_streams == [0, 1]
        local = fleet.process_local_scans(mixed, poses, stamp=1.0)
        assert sorted(local) == [0, 1]
        assert len(local[0].detections) == 1
        assert local[0].detections[0].id == msgs[0].detections[0].id + 1
        assert len(local[1].detections) == 0

    def test_sequential_explore_rejected(self, mesh):
        """The parity instrument's per-query cond branches contain
        collectives and cannot stay in lockstep across stream groups."""
        cfg = sharded_config(sequential_explore=True)
        with pytest.raises(ValueError, match="sequential_explore"):
            make_fleet_grid_step(cfg, make_lut(cfg.sensor), mesh)
