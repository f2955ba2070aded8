"""Long-run soak: 200 scans through the live node, phase changes included.

None of the scenario tests pin long-horizon stability; this one drives the
real ``VoFOD`` node (the production fused step) through background warmup,
a 60-scan tracked target, a live param change mid-run, a clearing phase with
the target gone, and a reappearance — asserting the invariants that must
hold on EVERY scan of a deployment:

* the grid stays finite (no NaN/Inf creep) except the +inf apriori voxels,
  and scores stay inside the EMA's reachable hull (the score params span
  ~1000 units; EMA/raycast updates are convex combinations);
* detection ids are strictly monotonic across the whole run (the reference's
  monotonically counting detection id, vofod_nodelet.cpp:845);
* diagnostics stay inside their capacity bounds;
* detections appear while the target flies and stop after the freespace
  raycast clears it (scan-level recovery, ref raycast_cloud :1396-1606).
"""

import math

import numpy as np

from tests.test_scenarios import make_node, warm
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan

N_WARM = 40
N_TARGET = 60
N_CLEAR = 40
N_AGAIN = 60


def test_soak_200_scans():
    node = make_node()
    cfg = node.cfg
    pose = hover_pose((0.0, 0.0, 3.0))
    warm(node, pose, n=N_WARM)

    apriori_inf = np.isinf(np.asarray(node.state.grid))
    empty = render_scan(Scene(ground_z=0.0), node.lut, pose)

    last_id = -1
    det_scans = {"target": 0, "clear": 0, "again": 0}
    total = N_TARGET + N_CLEAR + N_AGAIN
    for i in range(total):
        if i < N_TARGET:
            phase = "target"
        elif i < N_TARGET + N_CLEAR:
            phase = "clear"
        else:
            phase = "again"

        if phase == "clear":
            scan = empty
        else:
            th = 0.12 * i
            sc = Scene(ground_z=0.0)
            sc.add_sphere(
                center=(8.0 + math.cos(th), 1.5 * math.sin(th), 5.0),
                radius=0.5,
            )
            scan = render_scan(sc, node.lut, pose)

        if i == N_TARGET + 5:  # live tuning mid-run must not disturb ids
            node.update_params(thr_frontiers=node.dyn.thr_frontiers * 1.05)
        if i == N_TARGET + 25:
            node.update_params(thr_frontiers=node.dyn.thr_frontiers / 1.05)

        msg = node.process_scan(scan, None, pose)

        if msg.detections:
            det_scans[phase] += 1
            ids = sorted(d.id for d in msg.detections)
            assert ids[0] > last_id, (i, ids, last_id)
            assert len(set(ids)) == len(ids), (i, ids)
            last_id = ids[-1]
            for d in msg.detections:
                assert np.all(np.isfinite(d.position)), i
                assert 0.0 <= d.confidence <= 1.0, (i, d.confidence)
                assert 0 < d.n_points <= cfg.max_far_voxels, i

        diag = node.last_diag
        assert 0 <= int(diag.n_occupied) <= cfg.sensor.n_points, i
        assert 0 <= int(diag.n_detections) <= cfg.max_clusters, i

        if i % 20 == 19:  # grid-health sweep (device fetch; keep it sparse)
            g = np.asarray(node.state.grid)
            inf_now = np.isinf(g)
            assert np.array_equal(inf_now, apriori_inf), i
            finite = g[~inf_now]
            assert np.all(np.isfinite(finite)), i
            assert float(np.abs(finite).max()) <= 1500.0, (
                i, float(np.abs(finite).max()))

    # the target was tracked, the clearing phase converged to silence, and
    # detection resumed on reappearance with fresh monotonic ids
    assert det_scans["target"] >= 20, det_scans
    assert det_scans["again"] >= 20, det_scans
    # clearing takes a few scans of raycast EMA; silence must dominate
    assert det_scans["clear"] <= 10, det_scans
