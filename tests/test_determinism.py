"""Determinism oracle: the functional design replaces the reference's mutex
discipline (SURVEY.md §5 race detection) — identical inputs must yield
bit-identical trajectories, unlike the thread-interleaving-dependent
reference."""

import numpy as np

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.runtime.node import NodeOptions, VoFOD


def _run_once():
    cfg = VoFODConfig(
        sensor=SensorConfig(vertical_rays=16, horizontal_rays=64),
        oparea=Box((0, 0, 4), (16.0, 16.0, 12.0)),
        background_sufficient_points_ratio=0.05,
        max_clusters=4, max_far_voxels=256, max_queries=64,
        explore_submap=16, confidence_submap=8,
    )
    node = VoFOD(cfg, DynParams(), NodeOptions(raycast_mode="sweep"))
    xs = np.arange(-4.0, 4.0, 0.5)
    gx, gy = np.meshgrid(xs, xs)
    node.load_apriori_map(
        np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    )
    pose = hover_pose((0.0, 0.0, 3.0))
    sc = Scene(ground_z=0.0)
    sc.add_sphere(center=(4.0, 0.0, 5.0), radius=0.5)
    r0 = render_scan(Scene(ground_z=0.0), node.lut, pose)
    r1 = render_scan(sc, node.lut, pose)
    msgs = []
    for i in range(12):
        msgs.append(node.process_scan(r0 if i < 9 else r1, None, pose))
    return np.asarray(node.state.grid), msgs


def test_bit_identical_reruns():
    g1, m1 = _run_once()
    g2, m2 = _run_once()
    np.testing.assert_array_equal(g1, g2)
    assert len(m1) == len(m2)
    for a, b in zip(m1, m2):
        assert len(a.detections) == len(b.detections)
        for da, db in zip(a.detections, b.detections):
            assert da.position == db.position
            assert da.confidence == db.confidence
