"""Hostile sensor inputs: NaN/Inf ranges, NaN intensity, non-finite poses.

The reference consumes uint32 ranges, so non-finite values cannot reach its
math, and it skips any scan whose world-transform lookup fails
(vofod_nodelet.cpp:900-914); this framework ALSO accepts float range images
(NPZ replay, arbitrary transports), where NaN/Inf arrive from buggy drivers
or float conversions, and a lost TF arrives as a NaN pose.  Contract pinned
here:

* non-finite float ranges behave exactly like their sanitized equivalents —
  NaN and negative ranges are no-returns (the raw frontend's ``r > 0`` is
  False for both), +inf is a return that misses the operation area but still
  opens the per-pixel raycast gate (the reference's skip rule keys on
  ``range != 0``, vofod_nodelet.cpp:1449-1450) — IDENTICALLY in the raw
  device frontend, the exact-DDA raycast, and both host binners
  (io/binner.py sanitizes before its uint32 cast; pipeline/step.py
  sanitizes the exact-mode ray lengths);
* a non-finite pose skips the scan entirely — state untouched, empty
  detections message, counted on ``node.n_pose_rejected`` — including the
  NaN-rotation / finite-translation case that would otherwise reach the
  raycast gate math (runtime/node.py process_scan_async);
* the persistent grid never picks up NaN across a hostile-scan sequence
  (+inf is legitimate — apriori stamping).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.geometry import GridSpec
from vofod_tpu.io.binner import HostBinner
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.pipeline.frontend import run_frontend
from vofod_tpu.runtime.node import NodeOptions, VoFOD
from vofod_tpu.sensor import make_lut


def small_cfg(**kw):
    d = dict(
        sensor=SensorConfig(
            vertical_rays=16, horizontal_rays=64, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 5.75), (16.0, 16.0, 11.5)),
        background_sufficient_points_ratio=0.05,
        max_clusters=8,
        max_far_voxels=512,
        max_queries=64,
        explore_submap=16,
        confidence_submap=8,
    )
    d.update(kw)
    return VoFODConfig(**d)


def poison(ranges_u32, seed=7):
    """Float copy of a rendered scan with NaN/+inf/-inf/negative pixels, plus
    the sanitized float equivalent (what io/binner.py maps them to)."""
    rng = np.random.default_rng(seed)
    r = ranges_u32.astype(np.float32).ravel().copy()
    n = r.size
    picks = rng.choice(n, size=4 * (n // 16), replace=False)
    qs = np.array_split(picks, 4)
    r[qs[0]] = np.nan
    r[qs[1]] = np.inf
    r[qs[2]] = -np.inf
    r[qs[3]] = -1234.5
    sane = r.copy()
    sane[qs[0]] = 0.0  # NaN -> no return
    sane[qs[1]] = 4.0e9  # +inf -> a 4000 km return (misses any oparea)
    sane[qs[2]] = 0.0  # -inf / negative -> no return
    sane[qs[3]] = 0.0
    return r, sane, qs


@pytest.fixture(scope="module")
def scan_and_pose():
    cfg = small_cfg()
    lut = make_lut(cfg.sensor)
    pose = hover_pose((1.0, 0.5, 7.0), yaw=0.2)
    scene = Scene(ground_z=0.5)
    scene.add_box((4.5, -5.5, 0.0), (6.5, -3.5, 2.0))
    scene.add_sphere(center=(4.0, 0.3, 9.0), radius=0.7)
    return cfg, lut, pose, render_scan(scene, lut, pose)


class TestKernelLevel:
    def test_raw_frontend_nonfinite_equals_sanitized(self, scan_and_pose):
        cfg, lut, pose, ranges = scan_and_pose
        bad, sane, _ = poison(ranges)
        grid = GridSpec.from_config(cfg)
        dirs, offs = jnp.asarray(lut.directions), jnp.asarray(lut.offsets)
        fe_bad = run_frontend(
            cfg, grid, dirs, offs, jnp.asarray(bad), jnp.asarray(pose)
        )
        fe_ok = run_frontend(
            cfg, grid, dirs, offs, jnp.asarray(sane), jnp.asarray(pose)
        )
        np.testing.assert_array_equal(
            np.asarray(fe_bad.counts), np.asarray(fe_ok.counts)
        )
        np.testing.assert_array_equal(
            np.asarray(fe_bad.blockers), np.asarray(fe_ok.blockers)
        )
        assert int(fe_bad.n_valid_points) == int(fe_ok.n_valid_points)
        assert not np.isnan(np.asarray(fe_bad.counts)).any()

    @pytest.mark.parametrize("use_native", [True, False])
    def test_host_binners_nonfinite_float(self, scan_and_pose, use_native):
        """Both host binners map hostile floats to the documented uint32
        semantics — identical packed grid, gate and stats to the sanitized
        scan (whose uint32 cast is well-defined)."""
        cfg, lut, pose, ranges = scan_and_pose
        bad, sane, _ = poison(ranges)
        hb = HostBinner(cfg, lut, use_native=use_native)
        a = hb.bin(bad, pose)
        b = hb.bin(sane.astype(np.uint64).astype(np.uint32), pose)
        np.testing.assert_array_equal(a.packed, b.packed)
        np.testing.assert_array_equal(a.active, b.active)
        assert a.n_valid_points == b.n_valid_points
        assert a.n_exclude_hits == b.n_exclude_hits

    @pytest.mark.parametrize("use_native", [True, False])
    def test_nan_intensity_passes_gate(self, scan_and_pose, use_native):
        """NaN intensity PASSES the gate in both binners, matching the
        reference's skip rule ``intensity < min -> skip``
        (vofod_nodelet.cpp:1449): ``NaN < x`` is false, so the ray is cast.
        Both binners use the negated form ``!(i < min)``, not ``i >= min``,
        to preserve this IEEE behavior."""
        cfg, lut, pose, ranges = scan_and_pose
        hb = HostBinner(cfg, lut, use_native=use_native)
        inten = np.full(ranges.size, 10.0, np.float32)  # below threshold
        nan_px = np.arange(0, ranges.size, 5)
        inten[nan_px] = np.nan
        hi = inten.copy()
        hi[nan_px] = 1.0e9  # sanitized equivalent: above any threshold
        a = hb.bin(ranges, pose, intensity=inten, min_intensity=50.0)
        b = hb.bin(ranges, pose, intensity=hi, min_intensity=50.0)
        np.testing.assert_array_equal(a.active, b.active)
        # the NaN pixels are the only ones open (10.0 < 50.0 closes the rest
        # where the mask/range term allows)
        np.testing.assert_array_equal(a.active[nan_px], b.active[nan_px])
        assert a.active[nan_px].any()
        np.testing.assert_array_equal(a.packed, b.packed)


@pytest.mark.slow  # whole-node step compiles
class TestNodeLevel:
    @pytest.mark.parametrize("raycast_mode", ["sweep", "exact"])
    def test_hostile_sequence_bitexact_vs_sanitized(self, raycast_mode):
        """A scan sequence with poisoned float ranges + NaN intensity drives
        the node to the BIT-IDENTICAL state of the sanitized sequence, in
        both raycast modes (the exact-DDA mode is the one where a NaN ray
        length would scatter NaN into the grid — pipeline/step.py)."""
        cfg = small_cfg()
        lut = make_lut(cfg.sensor)

        def run(sanitized):
            node = VoFOD(cfg, DynParams(), NodeOptions(raycast_mode=raycast_mode))
            for i in range(6):
                pose = hover_pose(
                    (np.cos(0.3 * i), np.sin(0.3 * i), 7.0), yaw=0.1 * i
                )
                scene = Scene(ground_z=0.5)
                scene.add_sphere(center=(4.0, 0.2 * i, 9.0), radius=0.7)
                ranges = render_scan(scene, lut, pose)
                bad, sane, qs = poison(ranges, seed=100 + i)
                inten = np.full(ranges.size, 100.0, np.float32)
                inten_bad = inten.copy()
                inten_bad[qs[0]] = np.nan
                inten_sane = inten.copy()
                # NaN passes the `intensity < min -> skip` gate (ref :1449),
                # so its sanitized equivalent is above-any-threshold
                inten_sane[qs[0]] = 1.0e9
                if sanitized:
                    node.process_scan(sane, inten_sane, pose, stamp=0.1 * i)
                else:
                    node.process_scan(bad, inten_bad, pose, stamp=0.1 * i)
            return node

        a, b = run(sanitized=False), run(sanitized=True)
        ga, gb = np.asarray(a.state.grid), np.asarray(b.state.grid)
        assert not np.isnan(ga).any()
        np.testing.assert_array_equal(ga, gb)
        np.testing.assert_array_equal(
            np.asarray(a.state.safe), np.asarray(b.state.safe)
        )

    def test_nonfinite_pose_skips_scan(self):
        """Non-finite poses (lost TF) skip the scan before any device work —
        ref getTransformToWorld failure + return (vofod_nodelet.cpp:900-914)."""
        cfg = small_cfg()
        lut = make_lut(cfg.sensor)
        node = VoFOD(cfg, DynParams(), NodeOptions(raycast_mode="sweep"))
        pose = hover_pose((0.0, 0.0, 7.0))
        ranges = render_scan(Scene(ground_z=0.5), lut, pose)
        node.process_scan(ranges, None, pose)  # one sane scan
        grid_before = np.asarray(node.state.grid).copy()
        step_before = node._host_step

        all_nan = np.full((4, 4), np.nan, np.float32)
        rot_nan = pose.copy().astype(np.float32)
        rot_nan[:3, :3] = np.nan  # finite translation — the sneaky case
        inf_pose = pose.copy().astype(np.float32)
        inf_pose[2, 3] = np.inf
        for k, bad_pose in enumerate([all_nan, rot_nan, inf_pose]):
            msg = node.process_scan(ranges, None, bad_pose, stamp=1.0 + k)
            assert msg.detections == []
            assert node.n_pose_rejected == k + 1
        assert node._host_step == step_before  # no step consumed
        np.testing.assert_array_equal(np.asarray(node.state.grid), grid_before)

        # the node keeps working after the bad scans
        node.process_scan(ranges, None, pose)
        assert node._host_step == step_before + 1


@pytest.mark.slow  # batched shard_map compile on the 8-device mesh
class TestFleetLevel:
    def test_nan_pose_stream_becomes_null_scan(self):
        """Under SPMD lockstep a stream cannot sit a step out the way the
        single-stream node does, so a non-finite pose becomes a NULL scan
        (runtime/fleet.py _sanitize_rows): the stream's own state stays
        NaN-free, every OTHER stream is bit-unaffected (the lockstep conds
        mask the rejected stream's raycast off without diverging the
        collectives), and the rejection is counted per stream."""
        from vofod_tpu.runtime.fleet import FleetVoFOD

        cfg = small_cfg()
        lut = make_lut(cfg.sensor)
        pose = hover_pose((1.0, 0.5, 7.0), yaw=0.2)
        scene = Scene(ground_z=0.5)
        scene.add_sphere(center=(4.0, 0.3, 9.0), radius=0.7)
        ranges = render_scan(scene, lut, pose)
        B = 8
        scans = np.tile(ranges, (B, 1))
        poses = np.tile(pose, (B, 1, 1)).astype(np.float32)

        def run(poison_tick):
            fleet = FleetVoFOD(cfg, DynParams(), n_streams=B)
            for t in range(5):
                p = poses.copy()
                if t == poison_tick:
                    p[2, :3, :3] = np.nan  # finite translation, NaN rotation
                msgs = fleet.process_scans(scans, p)
                assert len(msgs) == B  # every stream still gets a message
            return fleet

        a, b = run(poison_tick=3), run(poison_tick=None)
        ga, gb = np.asarray(a.state.grid), np.asarray(b.state.grid)
        assert not np.isnan(ga).any()
        for s in range(B):
            if s != 2:
                np.testing.assert_array_equal(ga[s], gb[s], err_msg=f"stream {s}")
        assert list(a.n_pose_rejected) == [0, 0, 1, 0, 0, 0, 0, 0]
        assert list(b.n_pose_rejected) == [0] * 8
        # the rejected stream missed exactly one scan's worth of evidence
        assert not np.array_equal(ga[2], gb[2])
