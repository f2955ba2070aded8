"""Recorded-scenario regression: deterministic scenario, stable outputs.

The reference is validated by rosbag replay (SURVEY.md §4); here a fixed
synthetic scenario plays the same role.  The test regenerates the scenario,
runs the full pipeline in BOTH raycast modes and checks: (a) exact and sweep
modes agree on what is detected and where (within physical tolerance), and
(b) key numeric outputs stay inside golden brackets so semantic drift in any
stage is caught.
"""

import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.runtime.node import NodeOptions, VoFOD

TARGET = np.array([8.0, 0.0, 5.0])


def _run(raycast_mode: str):
    cfg = VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=32, horizontal_rays=256, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 4.0), (40.0, 40.0, 20.0)),
        background_sufficient_points_ratio=0.05,
        max_clusters=8,
        max_queries=128,
    )
    node = VoFOD(cfg, DynParams(), NodeOptions(raycast_mode=raycast_mode))
    xs = np.arange(-6.0, 6.0, 0.4)
    gx, gy = np.meshgrid(xs, xs)
    node.load_apriori_map(
        np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    )
    pose = hover_pose((0.0, 0.0, 3.0))
    empty = render_scan(Scene(ground_z=0.0), node.lut, pose)
    scene = Scene(ground_z=0.0)
    scene.add_sphere(center=TARGET, radius=0.5)
    tgt = render_scan(scene, node.lut, pose)
    msgs = []
    for i in range(25):
        msgs.append(node.process_scan(empty, None, pose))
    for i in range(5):
        msgs.append(node.process_scan(tgt, None, pose))
    return node, msgs


@pytest.fixture(scope="module")
def runs():
    return {m: _run(m) for m in ("sweep", "exact")}


class TestModeParity:
    def test_both_modes_detect_target(self, runs):
        for mode, (node, msgs) in runs.items():
            final = msgs[-1]
            assert len(final.detections) == 1, mode
            pos = np.array(final.detections[0].position)
            assert np.linalg.norm(pos - TARGET) < 1.0, mode

    def test_positions_agree_between_modes(self, runs):
        p_sweep = np.array(runs["sweep"][1][-1].detections[0].position)
        p_exact = np.array(runs["exact"][1][-1].detections[0].position)
        np.testing.assert_allclose(p_sweep, p_exact, atol=0.75)

    def test_confidence_brackets(self, runs):
        for mode, (node, msgs) in runs.items():
            det = msgs[-1].detections[0]
            assert 0.0 < det.confidence <= 1.0
            assert 0.0 < det.detection_probability <= 1.0
            assert det.n_points >= 2

    def test_grid_statistics_bracket(self, runs):
        # coarse golden brackets on the converged map: enough cleared air,
        # enough background, nothing NaN
        for mode, (node, msgs) in runs.items():
            vals = np.asarray(node.state.grid)
            assert np.isfinite(vals[~np.isinf(vals)]).all()
            n_air = (vals < -750.0).sum()
            n_bg = ((vals > -300.0) & ~np.isinf(vals)).sum()
            assert n_air > 3000, (mode, n_air)
            assert 300 < n_bg < 20000, (mode, n_bg)

    def test_detection_count_stability(self, runs):
        # exactly one object in the scene: never more than one detection
        for mode, (node, msgs) in runs.items():
            for m in msgs:
                assert len(m.detections) <= 1
