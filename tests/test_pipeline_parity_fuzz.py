"""Randomized whole-pipeline parity fuzz: seeded random scenarios through the
NumPy reference oracle AND the TPU step in reference-exact modes.

The four hand-built parity scenarios (test_pipeline_parity*.py) pin specific
behaviors (gates, rangefinder, multi-object); this fuzz drives the SAME
detection-level agreement contract over randomized scenes — structure
layout/count, target trajectory/size/speed, the sensor's flight arc and the
raycast weighting are all drawn per seed — so the agreement cannot be an
artifact of one scene's geometry.  Reference semantics under test:
vofod_nodelet.cpp:882-1096 (processMsg), :1396-1606 (raycast_cloud),
:1124-1294 (updateSeparatedBGClusters).

Cost control: every seed shares one VoFODConfig, so the TPU step compiles
once (pipeline/step.py step cache); each seed then replays a fresh state
against a fresh oracle.  Scenes are generated with a fixed-seed Generator —
the fuzz is fully deterministic and reproducible by seed.

Position contract (a finding of this fuzz): the detection position is the
PCA OBB center (ref extractDetections :840-848 via MomentOfInertia), and for
tiny clusters (3-7 voxels) the member covariance is rank-deficient, so the
eigenbasis is arbitrary in the (near-)null space — f32 vs f64 ties resolve
differently and the OBB center legitimately shifts sub-voxel (PCL's float
eigensolver is a third equally-valid answer; DESIGN.md §9 rates the OBB row
"equiv", not "exact").  Membership parity is still pinned exactly through
n_points/ids and the member-sensitive confidence (rtol 2e-3), and the
position must satisfy: |Δ| <= 1e-3, OR (|Δ| <= one voxel AND the TPU
position lies inside the oracle's member AABB inflated by half a voxel).
"""

import math

import numpy as np
import pytest

from tests.ref_pipeline import RefPipeline
from tests.test_pipeline_parity import parity_config, run_tpu
from vofod_tpu.config import DynParams
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.sensor import make_lut

N_WARMUP = 12
N_TARGET = 16
SEEDS = [7, 23, 51, 88]


def fuzz_scenario(seed):
    """Draw (dyn, scans) for one seed.

    Geometry stays inside the envelope the parity config's grid and sensor
    FOV support (target floating well above any structure; elevation to the
    target within the 90 deg vertical FOV), but every free parameter inside
    that envelope is randomized.
    """
    rng = np.random.default_rng(1000 + seed)
    cfg = parity_config(
        sepclusters_exact_census=True, compat_hascloseto_bounds=True
    )
    lut = make_lut(cfg.sensor)

    dyn = DynParams(
        raycast_weight_coefficient=float(rng.uniform(0.3, 0.7)),
    )

    # sensor arc
    arc_r = float(rng.uniform(1.0, 2.5))
    arc_w = float(rng.uniform(0.1, 0.25))
    arc_z = float(rng.uniform(6.5, 7.5))
    yaw_w = float(rng.uniform(0.0, 0.15))
    # ground structures (never taller than z=3; the target flies at z>8.5)
    scene0 = Scene(ground_z=0.5)
    for _ in range(int(rng.integers(1, 3))):
        cx = float(rng.uniform(3.0, 7.5))
        cy = float(rng.uniform(-6.5, 6.5))
        hx = float(rng.uniform(0.5, 1.25))
        hy = float(rng.uniform(0.5, 1.25))
        hgt = float(rng.uniform(1.0, 2.5))
        scene0.add_box((cx - hx, cy - hy, 0.0), (cx + hx, cy + hy, hgt))
    # target sphere trajectory
    t_rad = float(rng.uniform(0.5, 0.85))
    tx0 = float(rng.uniform(3.5, 4.8))
    ty0 = float(rng.uniform(-1.0, 1.0))
    tz = float(rng.uniform(8.5, 9.5))
    tvx = float(rng.uniform(-0.1, -0.05))
    ty_amp = float(rng.uniform(0.0, 0.4))
    ty_w = float(rng.uniform(0.2, 0.6))

    scans = []
    for i in range(N_WARMUP + N_TARGET):
        th = arc_w * i
        pose = hover_pose(
            (arc_r * math.cos(th), arc_r * math.sin(th), arc_z),
            yaw=yaw_w * i,
        )
        scene = Scene(ground_z=scene0.ground_z)
        scene.boxes = list(scene0.boxes)
        if i >= N_WARMUP:
            t = i - N_WARMUP
            scene.add_sphere(
                center=(
                    tx0 + tvx * t,
                    ty0 + ty_amp * math.sin(ty_w * t),
                    tz,
                ),
                radius=t_rad,
            )
        ranges = render_scan(scene, lut, pose)
        scans.append((ranges, np.ones(ranges.size, np.float32), pose))
    return cfg, lut, dyn, scans


def run_oracle(cfg, lut, dyn, scans):
    ref = RefPipeline(cfg, dyn, lut)
    ref.vmap[1, :, :] = np.inf  # apriori ground plane (ref :339-341)
    return [ref.step(r, inten, pose) for r, inten, pose in scans], ref


def run_tpu_exact(cfg, lut, dyn, scans, raycast_mode="exact"):
    """Thin wrapper over the shared parity harness (test_pipeline_parity
    .run_tpu, which stamps the apriori ground row like the oracle side):
    drops the diag halves so the fuzz's assertions read plain per-scan
    detection lists."""
    outs, state = run_tpu(cfg, lut, scans, raycast_mode, dyn=dyn)
    return [dets for dets, _diag in outs], state


@pytest.fixture(scope="module")
def oracle_cache():
    """seed -> (oracle_out, ref): the NumPy oracle replay is the expensive
    half of each seed; the exact-parity and sweep-budget tests share it."""
    return {}


def get_oracle(seed, cache):
    if seed not in cache:
        cfg, lut, dyn, scans = fuzz_scenario(seed)
        cache[seed] = run_oracle(cfg, lut, dyn, scans)
    return cache[seed]


@pytest.mark.parametrize("seed", SEEDS)
def test_randomized_scenario_parity(seed, oracle_cache):
    cfg, lut, dyn, scans = fuzz_scenario(seed)
    oracle_out, ref = get_oracle(seed, oracle_cache)
    tpu_out, state = run_tpu_exact(cfg, lut, dyn, scans)

    # the drawn scenario must actually exercise detection (non-vacuous)
    n_det_scans = sum(1 for d, _ in oracle_out if d)
    assert n_det_scans >= 5, f"seed {seed}: only {n_det_scans} detect scans"

    for i, ((odets, _), tdets) in enumerate(zip(oracle_out, tpu_out)):
        assert len(tdets) == len(odets), (
            f"seed {seed} scan {i}: {len(tdets)} detections vs "
            f"oracle {len(odets)}"
        )
        osort = sorted(odets, key=lambda d: tuple(d["position"]))
        tsort = sorted(tdets, key=lambda d: tuple(d["position"]))
        for od, td in zip(osort, tsort):
            # OBB-center contract (degenerate-eigenbasis ambiguity, see
            # module docstring): exact, or sub-voxel inside the member AABB
            delta = float(np.max(np.abs(td["position"] - od["position"])))
            if delta > 1e-3:
                vs = cfg.voxel_size
                assert delta <= vs, (
                    f"seed {seed} scan {i}: position off by {delta:.4f} m"
                )
                lo = od["aabb_min"] - 0.5 * vs
                hi = od["aabb_max"] + 0.5 * vs
                assert np.all(td["position"] >= lo) and np.all(
                    td["position"] <= hi
                ), f"seed {seed} scan {i}: position outside the member AABB"
            assert td["n_points"] == od["n_points"], f"seed {seed} scan {i}"
            assert td["id"] == od["id"], f"seed {seed} scan {i}"
            np.testing.assert_allclose(
                td["confidence"], od["confidence"], rtol=2e-3,
                err_msg=f"seed {seed} scan {i}: confidence",
            )

    # final-grid divergence stays inside the documented budget
    g = np.asarray(state.grid)
    assert np.array_equal(np.isinf(g), np.isinf(ref.vmap))
    both_inf = np.isinf(g) & np.isinf(ref.vmap)
    with np.errstate(invalid="ignore"):
        diff = np.abs(np.where(both_inf, 0.0, g - ref.vmap))
    assert float(np.max(diff)) <= 15.0, (seed, float(np.max(diff)))
    assert float(np.mean(diff)) <= 0.05, (seed, float(np.mean(diff)))


@pytest.mark.parametrize("seed", SEEDS[:2])
def test_randomized_sweep_error_budget(seed, oracle_cache):
    """Production sweep mode vs the oracle on randomized scenes: the
    DESIGN.md §9 sweep-mode error budget (detection latency, position error,
    confidence drift) must hold beyond the hand-built scenario's geometry."""
    cfg_prod = parity_config()  # production defaults (local-density sepcl.)
    _, lut, dyn, scans = fuzz_scenario(seed)
    oracle_out, _ = get_oracle(seed, oracle_cache)
    sweep_out, _ = run_tpu_exact(
        cfg_prod, lut, dyn, scans, raycast_mode="sweep"
    )

    o_first = next((i for i, (d, _) in enumerate(oracle_out) if d), None)
    s_first = next((i for i, d in enumerate(sweep_out) if d), None)
    assert o_first is not None, f"seed {seed}: oracle never detected"
    assert s_first is not None, f"seed {seed}: sweep mode never detected"
    latency = s_first - o_first

    pos_errs, conf_deltas, matched = [], [], 0
    for (odets, _), sdets in zip(oracle_out, sweep_out):
        if not odets or not sdets:
            continue
        matched += 1
        for od in odets:
            sd = min(
                sdets,
                key=lambda d: np.linalg.norm(d["position"] - od["position"]),
            )
            pos_errs.append(
                float(np.linalg.norm(sd["position"] - od["position"]))
            )
            conf_deltas.append(abs(sd["confidence"] - od["confidence"]))

    assert matched >= 5, f"seed {seed}: only {matched} co-detected scans"
    report = (
        f"seed {seed} sweep-vs-oracle: latency {latency:+d} scans, pos err "
        f"max {max(pos_errs):.3f} m, conf delta max {max(conf_deltas):.3f}"
    )
    print(report)
    assert abs(latency) <= 3, report
    assert max(pos_errs) <= 0.75, report
    assert max(conf_deltas) <= 0.35, report
