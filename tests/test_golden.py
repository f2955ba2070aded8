"""Golden-fixture regression: recorded scans + expected outputs, committed.

The cross-round drift guard (SURVEY.md §4's recorded-scan regression role):
any semantic change to clustering, updates, raycast or classification that
moves the detection, its confidence, or the converged map shows up here.
Regenerate deliberately (see tests/fixtures/README) when a change is an
intentional semantic improvement.
"""

import os

import numpy as np

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.runtime.node import NodeOptions, VoFOD

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_small.npz")


def test_golden_replay():
    z = np.load(FIXTURE)
    cfg = VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=16, horizontal_rays=64, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 4.0), (16.0, 16.0, 12.0)),
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
    msgs = [
        node.process_scan(r, None, p) for r, p in zip(z["ranges"], z["poses"])
    ]
    first = next(i for i, m in enumerate(msgs) if m.detections)
    assert first == int(z["first_detection_scan"])
    det = msgs[-1].detections
    assert len(det) == 1
    np.testing.assert_allclose(
        np.array(det[0].position), z["expected_position"], atol=0.26
    )
    assert det[0].n_points == int(z["expected_n_points"])
    np.testing.assert_allclose(
        det[0].confidence, float(z["expected_confidence"]), atol=0.05
    )
    np.testing.assert_allclose(
        det[0].detection_probability, float(z["expected_pdet"]), atol=1e-4
    )
    g = np.asarray(node.state.grid)
    checksum = g[np.isfinite(g)].sum()
    np.testing.assert_allclose(
        checksum, float(z["grid_checksum"]), rtol=1e-4
    )
