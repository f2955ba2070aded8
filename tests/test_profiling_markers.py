"""Fused-mode profiling-marker SEQUENCE parity (round-2 verdict weak #5).

The fused step subsumes the reference's raycast and sepclusters threads; the
node emits duration-less START/END markers so ProfilingInfo consumers see the
same routine sequence.  These tests pin the marker schedule to the device
schedule (pipeline/step.py ``do_ray`` / ``run_sep``) across period values,
and to the reference's pause semantics — a paused routine returns BEFORE
``publish_profile_start`` so it emits nothing
(vofod_nodelet.cpp:1128-1133, 1400-1405).
"""

import dataclasses

import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io.msgs import ProfilingInfo
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.runtime.node import NodeOptions, VoFOD

N_SCANS = 7


def micro_config(**kw):
    return VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=8, horizontal_rays=32, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 5.75), (16.0, 16.0, 11.5)),
        max_clusters=4,
        max_far_voxels=256,
        max_queries=32,
        explore_submap=16,
        confidence_submap=8,
        **kw,
    )


def marker_scans(node, dyn, n=N_SCANS):
    """Run n empty-scene scans; return per-routine sets of scan indices that
    emitted a marker pair."""
    scene = Scene(ground_z=6.0)
    pose = hover_pose((8.0, 8.0, 9.0))
    ranges = render_scan(scene, node.lut, pose)
    out = {
        ProfilingInfo.ROUTINE_RAYCASTING: set(),
        ProfilingInfo.ROUTINE_SEPBGCLUSTERS: set(),
    }
    for k in range(n):
        before = {
            rid: sum(
                1
                for e in node.profiling.events
                if e.routine_id == rid
                and e.event_type == ProfilingInfo.EVENT_START
            )
            for rid in out
        }
        node.process_scan(ranges, None, pose, stamp=0.1 * k)
        for rid in out:
            after = sum(
                1
                for e in node.profiling.events
                if e.routine_id == rid
                and e.event_type == ProfilingInfo.EVENT_START
            )
            if after == before[rid] + 1:
                out[rid].add(k)
            else:
                assert after == before[rid], f"scan {k}: >1 marker for {rid}"
    # every START is paired with an END
    for rid in out:
        n_end = sum(
            1
            for e in node.profiling.events
            if e.routine_id == rid and e.event_type == ProfilingInfo.EVENT_END
        )
        assert n_end == len(out[rid])
    return out


class TestMarkerSchedule:
    @pytest.mark.parametrize("sep_every,ray_every", [(1, 1), (3, 2)])
    def test_matches_device_schedule(self, sep_every, ray_every):
        """Marker scans == the device's stage scans: step.py runs sepclusters
        on step indices k with k % sepclusters_every == 0 and the raycast on
        k % raycast_every == raycast_every - 1."""
        cfg = micro_config(sepclusters_every=sep_every)
        node = VoFOD(
            cfg,
            DynParams(),
            NodeOptions(raycast_mode="sweep", raycast_every=ray_every),
        )
        got = marker_scans(node, node.dyn)
        want_sep = {k for k in range(N_SCANS) if k % sep_every == 0}
        want_ray = {
            k for k in range(N_SCANS) if k % ray_every == ray_every - 1
        }
        assert got[ProfilingInfo.ROUTINE_SEPBGCLUSTERS] == want_sep
        assert got[ProfilingInfo.ROUTINE_RAYCASTING] == want_ray

    def test_paused_routines_emit_nothing(self):
        """Pause flags suppress the markers entirely, like the reference's
        early return before publish_profile_start."""
        cfg = micro_config(sepclusters_every=1)
        node = VoFOD(
            cfg,
            dataclasses.replace(
                DynParams(), raycast_pause=True, sepclusters_pause=True
            ),
            NodeOptions(raycast_mode="sweep"),
        )
        got = marker_scans(node, node.dyn, n=3)
        assert got[ProfilingInfo.ROUTINE_RAYCASTING] == set()
        assert got[ProfilingInfo.ROUTINE_SEPBGCLUSTERS] == set()


class TestDeviceTrace:
    """NodeOptions.trace_dir: one jax.profiler device-trace window around the
    step dispatches (SURVEY §5's per-kernel attribution tool)."""

    @pytest.mark.parametrize("staged", [False, True])
    def test_trace_directory_produced(self, tmp_path, staged):
        tdir = str(tmp_path / ("staged" if staged else "fused"))
        node = VoFOD(
            micro_config(), DynParams(),
            NodeOptions(
                raycast_mode="exact", profile_stages=staged,
                trace_dir=tdir, trace_skip=1, trace_scans=2,
            ),
        )
        pose = hover_pose((8.0, 8.0, 9.0))
        ranges = render_scan(Scene(ground_z=6.0), node.lut, pose)
        for k in range(5):
            node.process_scan(ranges, None, pose, stamp=0.1 * k)
        assert node._trace_state == "done"
        import glob

        # xprof writes plugins/profile/<run>/<host>.xplane.pb
        planes = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
        assert planes, f"no trace written under {tdir}"

    def test_short_run_flushes_trace(self, tmp_path):
        """A run that ends before trace_skip+trace_scans scans must still
        write the capture: close_trace() flushes the open window (called by
        replay() and an atexit hook) instead of leaving the profiler running
        and the trace lost."""
        tdir = str(tmp_path / "short")
        node = VoFOD(
            micro_config(), DynParams(),
            NodeOptions(
                raycast_mode="exact",
                trace_dir=tdir, trace_skip=1, trace_scans=50,
            ),
        )
        pose = hover_pose((8.0, 8.0, 9.0))
        ranges = render_scan(Scene(ground_z=6.0), node.lut, pose)
        for k in range(3):  # opens the window, never reaches scan 51
            node.process_scan(ranges, None, pose, stamp=0.1 * k)
        assert node._trace_state == "on"
        node.close_trace()
        assert node._trace_state == "done"
        node.close_trace()  # idempotent
        import glob

        planes = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
        assert planes, f"no trace written under {tdir}"

    def test_replay_flushes_trace(self, tmp_path):
        """replay() of a recording shorter than the trace window closes the
        window on the way out."""
        import numpy as np

        from vofod_tpu.io.scan_source import save_scans_npz

        tdir = str(tmp_path / "replay")
        node = VoFOD(
            micro_config(), DynParams(),
            NodeOptions(
                raycast_mode="exact",
                trace_dir=tdir, trace_skip=1, trace_scans=50,
            ),
        )
        pose = hover_pose((8.0, 8.0, 9.0))
        ranges = render_scan(Scene(ground_z=6.0), node.lut, pose)
        p = str(tmp_path / "scans.npz")
        save_scans_npz(p, np.stack([ranges] * 3), np.stack([pose] * 3))
        node.replay(p)
        assert node._trace_state == "done"
        import glob

        assert glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)

    def test_no_trace_without_option(self, tmp_path):
        node = VoFOD(micro_config(), DynParams(),
                     NodeOptions(raycast_mode="exact"))
        pose = hover_pose((8.0, 8.0, 9.0))
        ranges = render_scan(Scene(ground_z=6.0), node.lut, pose)
        node.process_scan(ranges, None, pose)
        assert node._trace_state == "done"  # never armed
