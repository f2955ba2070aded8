"""Live YAML param watching (runtime/param_watch.py) — the
dynamic_reconfigure analogue for offline/serving runs.  The reference reads
every dynamic_reconfigure value each scan (vofod_nodelet.cpp
m_drmgr_ptr->config.*); here an edited detection_params YAML applies before
the next scan without recompiling."""

import os

import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.runtime.node import VoFOD
from vofod_tpu.runtime.param_watch import ParamWatcher


def _node(**cfg_kw):
    cfg = VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=8, horizontal_rays=32, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 5.0), (10.0, 10.0, 10.0)),
        max_clusters=4,
        max_far_voxels=128,
        max_queries=32,
        explore_submap=8,
        confidence_submap=8,
        **cfg_kw,
    )
    return VoFOD(cfg, DynParams())


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)
    # poll() keys on mtime: force it forward (same-second edits)
    st = os.stat(path)
    os.utime(path, (st.st_atime, st.st_mtime + 1.0))


class TestParamWatcher:
    def test_initial_poll_applies_file(self, tmp_path):
        node = _node()
        p = str(tmp_path / "params.yaml")
        _write(p, "classification: {max_size: 5.0}\n")
        w = ParamWatcher(node, p)
        changed = w.poll()
        assert changed == {"cls_max_size": 5.0}
        assert node.dyn.cls_max_size == 5.0

    def test_unchanged_file_is_noop(self, tmp_path):
        node = _node()
        p = str(tmp_path / "params.yaml")
        _write(p, "classification: {max_size: 5.0}\n")
        w = ParamWatcher(node, p)
        w.poll()
        assert w.poll() is None  # same mtime: not even reparsed
        assert w.n_applied == 1

    def test_edit_applies_delta(self, tmp_path):
        node = _node()
        p = str(tmp_path / "params.yaml")
        _write(p, "raycast: {pause: false}\n")
        w = ParamWatcher(node, p)
        w.poll()
        _write(p, "raycast: {pause: true, max_distance: 15.0}\n")
        changed = w.poll()
        assert changed == {"raycast_pause": True, "raycast_max_distance": 15.0}
        assert node.dyn.raycast_pause is True
        assert node.dyn.raycast_max_distance == 15.0
        # first poll matched the defaults (no-op); only the edit applied
        assert w.n_applied == 1

    def test_static_radius_skipped_with_warning(self, tmp_path, caplog):
        node = _node()  # dynamic_radii=False
        p = str(tmp_path / "params.yaml")
        _write(
            p,
            "ground_points_max_distance: 2.5\n"
            "classification: {max_size: 4.0}\n",
        )
        w = ParamWatcher(node, p)
        with caplog.at_level("WARNING", logger="vofod_tpu.params"):
            changed = w.poll()
        assert changed == {"cls_max_size": 4.0}  # radius filtered out
        assert node.dyn.ground_points_max_distance == 1.5  # untouched
        assert any("dynamic_radii" in r.message for r in caplog.records)

    def test_dynamic_radii_node_accepts_radius(self, tmp_path):
        node = _node(dynamic_radii=True)
        p = str(tmp_path / "params.yaml")
        _write(p, "ground_points_max_distance: 1.0\n")
        w = ParamWatcher(node, p)
        changed = w.poll()
        assert changed == {"ground_points_max_distance": 1.0}
        assert node.dyn.ground_points_max_distance == 1.0

    def test_malformed_edit_keeps_previous(self, tmp_path, caplog):
        node = _node()
        p = str(tmp_path / "params.yaml")
        _write(p, "classification: {max_size: 5.0}\n")
        w = ParamWatcher(node, p)
        w.poll()
        _write(p, "classification: {max_size: [unclosed\n")
        with caplog.at_level("WARNING", logger="vofod_tpu.params"):
            assert w.poll() is None
        assert node.dyn.cls_max_size == 5.0
        assert any("unparsable" in r.message for r in caplog.records)
        # a fixed file is picked up on the next poll
        _write(p, "classification: {max_size: 6.0}\n")
        assert w.poll() == {"cls_max_size": 6.0}

    def test_partial_file_keeps_tuned_params(self, tmp_path):
        """A partial file overrides ONLY the keys it names: params tuned at
        runtime (update_params / --config) and absent from the watched file
        must not snap back to the dataclass defaults."""
        node = _node()
        node.update_params(cls_max_size=5.0, thr_new_obstacles=0.42)
        p = str(tmp_path / "params.yaml")
        _write(p, "raycast: {pause: true}\n")
        w = ParamWatcher(node, p)
        assert w.poll() == {"raycast_pause": True}
        assert node.dyn.cls_max_size == 5.0
        assert node.dyn.thr_new_obstacles == 0.42

    def test_missing_file_is_noop(self, tmp_path):
        node = _node()
        w = ParamWatcher(node, str(tmp_path / "absent.yaml"))
        assert w.poll() is None
        assert node.dyn == DynParams()


class TestReplayHook:
    def test_before_scan_called_per_scan(self, tmp_path):
        from vofod_tpu.io.scan_source import (
            Scene, hover_pose, render_scan, save_scans_npz,
        )
        from vofod_tpu.sensor import make_lut_simulation

        node = _node()
        lut = make_lut_simulation(32, 8, np.deg2rad(90.0))
        pose = hover_pose((0.0, 0.0, 3.0))
        r = render_scan(Scene(ground_z=0.07), lut, pose)
        p = str(tmp_path / "scans.npz")
        save_scans_npz(p, np.stack([r] * 3), np.stack([pose] * 3))
        seen = []
        node.replay(p, before_scan=seen.append)
        assert seen == [0, 1, 2]
