"""FleetVoFOD multi-stream serving on the virtual 8-device mesh."""

import numpy as np

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.ops.binning import voxel_grid_counted
from vofod_tpu.runtime.fleet import FleetVoFOD


def test_fleet_end_to_end_detects_per_stream():
    cfg = VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=24, horizontal_rays=128, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 4.0), (30.0, 30.0, 16.0)),
        background_sufficient_points_ratio=0.05,
        max_clusters=8,
        max_far_voxels=512,
        max_queries=64,
        explore_submap=16,
        confidence_submap=8,
    )
    fleet = FleetVoFOD(cfg, DynParams(), n_streams=8)
    xs = np.arange(-5.0, 5.0, 0.4)
    gx, gy = np.meshgrid(xs, xs)
    fleet.load_apriori_map(
        np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    )

    pose = hover_pose((0.0, 0.0, 3.0))
    lut = fleet.lut
    empty = render_scan(Scene(ground_z=0.0), lut, pose)
    # streams 0-3: target appears late; streams 4-7: stay empty
    sc = Scene(ground_z=0.0)
    sc.add_sphere(center=(6.0, 0.0, 5.0), radius=0.5)
    tgt = render_scan(sc, lut, pose)

    B = 8
    poses = np.tile(pose, (B, 1, 1))
    for _ in range(40):
        fleet.process_scans(np.tile(empty, (B, 1)), poses)
    mixed = np.stack([tgt] * 4 + [empty] * 4)
    msgs = None
    for _ in range(4):
        msgs = fleet.process_scans(mixed, poses)
    for b in range(4):
        assert len(msgs[b].detections) == 1, f"stream {b}"
        pos = np.array(msgs[b].detections[0].position)
        assert np.linalg.norm(pos - [6.0, 0.0, 5.0]) < 1.0
    for b in range(4, 8):
        assert len(msgs[b].detections) == 0, f"stream {b}"

    # multi-host entry point: single-process it must cover every stream and
    # agree with process_scans' view of the same (advanced-by-one) sequence
    assert fleet.local_streams == list(range(8))
    local = fleet.process_local_scans(mixed, poses, stamp=1.0)
    assert sorted(local) == list(range(8))
    for b in range(4):
        assert len(local[b].detections) == 1, f"stream {b} (local)"
        pos = np.array(local[b].detections[0].position)
        assert np.linalg.norm(pos - [6.0, 0.0, 5.0]) < 1.0
        # ids keep counting monotonically from the process_scans ticks
        assert local[b].detections[0].id == msgs[b].detections[0].id + 1
    for b in range(4, 8):
        assert len(local[b].detections) == 0, f"stream {b} (local)"
    assert local[0].header.frame_id == "stream0"


def test_reset_stream_cold_starts_one_detector():
    """reset_stream(i) — the reference's ~reset service per stream
    (ref vofod_nodelet.cpp:1610-1632): stream i's state returns to the
    cold-start init bit-for-bit, every other stream's state is untouched,
    and the fleet keeps serving (stream i re-converges from scratch while
    its step counter now runs offset from the others)."""
    import jax

    from vofod_tpu.parallel.sharding import init_batched_state

    cfg = VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=8, horizontal_rays=32, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 4.0), (8.0, 8.0, 8.0)),
        max_clusters=4,
        max_far_voxels=128,
        max_queries=32,
        explore_submap=8,
        confidence_submap=8,
    )
    fleet = FleetVoFOD(cfg, DynParams(), n_streams=8)
    xs = np.arange(-3.0, 3.0, 0.4)
    gx, gy = np.meshgrid(xs, xs)
    fleet.load_apriori_map(
        np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    )
    pose = hover_pose((0.0, 0.0, 3.0))
    sc = Scene(ground_z=0.0)
    sc.add_sphere(center=(2.0, 0.0, 6.0), radius=0.5)
    scan = render_scan(sc, fleet.lut, pose)
    B = 8
    poses = np.tile(pose, (B, 1, 1))
    n_warm = 5
    for _ in range(n_warm):
        fleet.process_scans(np.tile(scan, (B, 1)), poses)
    before = jax.device_get(fleet.state)

    fleet.reset_stream(3)
    after = jax.device_get(fleet.state)
    fresh = jax.device_get(init_batched_state(cfg, DynParams(), B, fleet.mesh))
    for name in before._fields:
        b_, a_, f_ = (
            getattr(before, name), getattr(after, name), getattr(fresh, name)
        )
        np.testing.assert_array_equal(
            np.asarray(a_)[3], np.asarray(f_)[3],
            err_msg=f"{name}: stream 3 not cold-started",
        )
        keep = np.arange(B) != 3
        np.testing.assert_array_equal(
            np.asarray(a_)[keep], np.asarray(b_)[keep],
            err_msg=f"{name}: other streams perturbed",
        )
    assert int(np.asarray(after.step)[3]) == 0
    assert int(np.asarray(after.step)[0]) == n_warm

    # the fleet keeps serving through the donated-state swap; the reset
    # stream's counter stays offset from the others
    fleet.process_scans(np.tile(scan, (B, 1)), poses)
    step = np.asarray(jax.device_get(fleet.state.step))
    assert step[3] == 1 and step[0] == n_warm + 1

    # intensity-less ticks reuse ONE cached device all-ones buffer (the
    # step never donates scan args; rebuilding per tick would re-upload
    # 524 KB x B every scan — same contract as runtime/node.py _ones_dev)
    assert fleet._ones_dev is not None
    cached = fleet._ones_dev
    fleet.process_scans(np.tile(scan, (B, 1)), poses)
    assert fleet._ones_dev is cached


def test_voxel_grid_counted_matches_oracle(rng):
    pts = rng.uniform(0, 8, size=(300, 3)).astype(np.float32)
    inten = rng.uniform(-1, 1, size=300).astype(np.float32)
    valid = rng.random(300) < 0.9
    import jax.numpy as jnp

    counts, sure = voxel_grid_counted(
        jnp.asarray(pts), jnp.asarray(inten), jnp.asarray(valid),
        leaf_size=2.0, threshold=0.3, out_shape=(4, 4, 4),
    )
    want_c = np.zeros((4, 4, 4), np.int64)
    want_s = np.zeros((4, 4, 4), np.int64)
    for p, i, v in zip(pts, inten, valid):
        if not v:
            continue
        c = np.floor(p / 2.0).astype(int)
        if (c >= 0).all() and (c < 4).all():
            want_c[c[2], c[1], c[0]] += 1
            if i > 0.3:
                want_s[c[2], c[1], c[0]] += 1
    np.testing.assert_array_equal(np.asarray(counts), want_c)
    np.testing.assert_array_equal(np.asarray(sure), want_s)


def test_fleet_intensity_gate_is_live():
    """The raycast/min_intensity gate (ref vofod_nodelet.cpp:1449) is LIVE
    under the batched fleet step: a stream whose intensity image closes the
    sector covering a disappeared target keeps believing the stale occupancy
    (no freespace update clears it), while an all-ones stream sees the same
    scans and clears it — per-stream divergence driven ONLY by intensity."""
    import dataclasses

    cfg = VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=24, horizontal_rays=128, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 4.0), (30.0, 30.0, 16.0)),
        background_sufficient_points_ratio=0.05,
        max_clusters=8,
        max_far_voxels=512,
        max_queries=64,
        explore_submap=16,
        confidence_submap=8,
    )
    dyn = dataclasses.replace(
        DynParams(), raycast_min_intensity=0.5,
        raycast_weight_coefficient=1.0,
    )
    fleet = FleetVoFOD(cfg, dyn, n_streams=8)
    xs = np.arange(-5.0, 5.0, 0.4)
    gx, gy = np.meshgrid(xs, xs)
    fleet.load_apriori_map(
        np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    )
    lut = fleet.lut
    pose = hover_pose((0.0, 0.0, 3.0))
    B = 8
    poses = np.tile(pose, (B, 1, 1))
    n_pts = cfg.sensor.n_points

    # phase 1 (all streams identical, full intensity): converge with a
    # floating sphere present — it accumulates positive occupancy
    sc = Scene(ground_z=0.0)
    sc.add_sphere(center=(6.0, 0.0, 5.0), radius=0.8)
    tgt = render_scan(sc, lut, pose)
    full = np.ones((B, n_pts), np.float32)
    for _ in range(30):
        fleet.process_scans(np.tile(tgt, (B, 1)), poses, intensity=full)

    # phase 2: the sphere disappears.  Streams 0-3 keep full intensity (their
    # raycasts clear the stale voxels); streams 4-7 get intensity below the
    # gate on EVERY pixel (their raycasts are all gated off, so the stale
    # occupancy persists).  Ranges and poses are IDENTICAL across streams.
    empty = render_scan(Scene(ground_z=0.0), lut, pose)
    gated = np.concatenate(
        [np.ones((4, n_pts), np.float32),
         np.full((4, n_pts), 0.1, np.float32)]
    )
    for _ in range(12):
        fleet.process_scans(np.tile(empty, (B, 1)), poses, intensity=gated)

    grids = np.asarray(fleet.state.grid)
    # voxel holding the sphere center (6, 0, 5)
    org = np.asarray(fleet.grid_spec.origin)
    ix = np.floor(([6.0, 0.0, 5.0] - org) / cfg.voxel_size).astype(int)
    cleared = grids[:4, ix[2], ix[1], ix[0]]
    stale = grids[4:, ix[2], ix[1], ix[0]]
    # ungated streams raycast the voxel down; gated streams never touch it
    assert float(stale.min()) > float(cleared.max()), (cleared, stale)
    np.testing.assert_array_equal(stale, stale[0])  # gated streams identical
