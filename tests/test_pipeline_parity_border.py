"""Whole-pipeline parity with the detection's confidence submap CLAMPED at
the grid border.

The reference's confidence submap is ``getSubmapCopy`` of the AABB inflated
by 2 voxels and CLAMPED to the grid (voxel_map.cpp:547-571; extractDetections
vofod_nodelet.cpp:851-867): a cluster near the operation area's top scores
its confidence over a SMALLER box than an interior cluster.  Every other
parity scenario keeps its targets deep interior, so the clamp branch
(fixed-window absolute-index masking in pipeline/detect.py + padded
dynamic_slice in gridops.submaps3) was previously untested at detection
level.

Construction notes (what bounds the geometry):

* a cluster cannot touch the hi-side grid shell through scan points at all —
  the operation-area crop keeps points <= oparea.hi while the shell row
  starts at ``lo + 0.5*ceil(2*size)`` >= oparea.hi (VoxelMap::resize rounds
  the grid UP, voxel_map.cpp:11-19) — and a shell-touching query would
  ground the cluster anyway (exploreToGround voxel_map.cpp:408-412; kernel
  coverage in tests/test_explore.py);
* the clamp regime is therefore hi_idx ∈ {nz-3, nz-2}: detectable, with the
  +2 inflation crossing nz-1.  We reuse the proven interior scenario and
  shrink the operation-area height so the target's top hit rows sit exactly
  there (measured: the sphere's visible rim bins into z rows ~17-18 of this
  lattice, so nz=20 clamps roughly half the detecting scans).
"""

import numpy as np
import pytest

from tests.ref_pipeline import RefPipeline
from tests.test_pipeline_parity import (
    make_scenario,
    parity_config,
    parity_dyn,
    run_tpu,
)
from vofod_tpu.config import Box


@pytest.fixture(scope="module")
def border_runs():
    # z ∈ [0, 9.5] -> nz = 20 (ceil(9.5/0.5)+1): ground plane stays at row 1
    # like the main scenario; the target (center z 9.0, r 0.7, rim hits up
    # to ~9.4) tops out at row 18 = nz-2 -> the +2 inflation clamps
    cfg = parity_config(
        oparea=Box((0.0, 0.0, 4.75), (16.0, 16.0, 9.5)),
        sepclusters_exact_census=True,
        compat_hascloseto_bounds=True,
    )
    lut, scans = make_scenario(cfg)

    ref = RefPipeline(cfg, parity_dyn(), lut)
    ref.vmap[1, :, :] = np.inf  # apriori ground row (ref :339-341)
    oracle_out = [ref.step(r, inten, p) for r, inten, p in scans]

    tpu_out, _ = run_tpu(cfg, lut, scans, raycast_mode="exact")
    return cfg, oracle_out, tpu_out


class TestBorderClusterParity:
    def test_clamp_actually_engages(self, border_runs):
        """Non-vacuity: the scenario must produce detections whose inflated
        AABB clamps at the grid's z-hi border (hi_idx + 2 > nz - 1)."""
        cfg, oracle_out, _ = border_runs
        nz = cfg.grid_shape[0]
        origin = np.array(cfg.grid_origin)
        det_scans = [d for d, _ in oracle_out if d]
        assert len(det_scans) >= 3, (
            f"only {len(det_scans)} detecting scans — scenario too marginal"
        )
        n_clamped = 0
        for dets in det_scans:
            for d in dets:
                hi_z = int(
                    np.floor((d["aabb_max"][2] - origin[2]) / cfg.voxel_size)
                )
                n_clamped += hi_z + 2 > nz - 1
        assert n_clamped >= 3, (
            f"only {n_clamped} clamped detections — scenario too marginal"
        )

    def test_detections_match(self, border_runs):
        _, oracle_out, tpu_out = border_runs
        for i, ((odets, _), (tdets, _)) in enumerate(
            zip(oracle_out, tpu_out)
        ):
            assert len(tdets) == len(odets), (
                f"scan {i}: {len(tdets)} detections vs oracle {len(odets)}"
            )
            osort = sorted(odets, key=lambda d: tuple(d["position"]))
            tsort = sorted(tdets, key=lambda d: tuple(d["position"]))
            for od, td in zip(osort, tsort):
                np.testing.assert_allclose(
                    td["position"], od["position"], atol=1e-3,
                    err_msg=f"scan {i}: detection position",
                )
                assert td["n_points"] == od["n_points"], f"scan {i}"
                assert td["id"] == od["id"], f"scan {i}"
                # the clamped-submap uncertainty sum is exactly what this
                # scenario exists to pin
                np.testing.assert_allclose(
                    td["confidence"], od["confidence"], rtol=2e-3,
                    err_msg=f"scan {i}: confidence (clamped submap)",
                )
                np.testing.assert_allclose(
                    td["detection_probability"],
                    od["detection_probability"],
                    rtol=1e-4,
                )
