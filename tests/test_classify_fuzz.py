"""Property fuzz: full classify() vs a reference-semantics NumPy oracle.

200 random tiny scenes through the whole classification path — component
slotting, gates (min_points / max_distance / max_size,
ref vofod_nodelet.cpp:1679-1690), the per-point exploreToGround DFS
(voxel_map.cpp:402-488 verbatim, incl. boundary-touch => grounded and the
shell-touch rule) and the frontier demotion sets (ref :1709-1716).

Deterministic-schedule reading (explore.py docstring): every query is
evaluated on the pre-demotion grid, and demotions apply only for clusters
whose every member failed (floating) — the reference's order-dependent
coupling, where earlier failed points' demotions can block later searches
within one scan, is intentionally not reproduced; the oracle implements the
same independent-evaluation semantics while keeping the DFS itself verbatim.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vofod_tpu.config import DynParams, VoFODConfig
from vofod_tpu.geometry import GridSpec
from vofod_tpu.ops.components import SENTINEL, label_components_seeded
from vofod_tpu.pipeline.classify import CLS_INVALID, CLS_MAV, CLS_UNKNOWN, classify

from oracles import euclidean_clusters_np, explore_to_ground_np

N_CASES = 200
SHAPE = (10, 12, 14)
VOXEL = 0.5
RADIUS = 3.0  # component tolerance in index units


def _oracle_case(vals, far, sensor_pos, dyn, submap):
    """Per-voxel expected class map + expected demoted-voxel set."""
    labels, ncomp = euclidean_clusters_np(far, RADIUS)
    nz, ny, nx = vals.shape
    cls_map = np.full(vals.shape, -1, np.int32)  # -1 = not a far voxel
    demoted = set()
    skip = np.zeros(vals.shape, bool)  # gate-margin too thin to compare

    for c in range(ncomp):
        zz, yy, xx = np.nonzero(labels == c)
        n = len(zz)
        centers = np.stack(
            [(xx + 0.5) * VOXEL, (yy + 0.5) * VOXEL, (zz + 0.5) * VOXEL], 1
        )
        mean = centers.mean(0)
        d = centers - mean
        cov = (d.T @ d) / n + 1e-6 * np.eye(3)
        evals, evecs = np.linalg.eigh(cov)
        axes = evecs[:, ::-1].T  # rows: major, middle, minor
        axes[2] = np.cross(axes[0], axes[1])
        proj = d @ axes.T
        pmin, pmax = proj.min(0), proj.max(0)
        obb_center = mean + axes.T @ ((pmin + pmax) / 2.0)
        obb_size = np.linalg.norm(pmax - pmin)
        dist = np.linalg.norm(obb_center - sensor_pos)

        # OBB extents are basis-dependent under eigenvalue degeneracy (any
        # two PCA implementations may legitimately disagree): skip those,
        # plus razor-edge gate margins — both measure-zero by construction
        # but common on integer lattices
        gaps = np.diff(np.sort(evals))
        degenerate = n > 2 and bool(
            np.any(gaps < 1e-4 * max(evals.max(), 1e-6))
        )
        margins = [
            dyn.cls_max_distance - dist,
            dyn.cls_max_size - obb_size,
        ]
        if degenerate or any(abs(m) < 1e-3 for m in margins):
            skip[labels == c] = True
            continue
        if (
            n < dyn.cls_min_points
            or dist > dyn.cls_max_distance
            or obb_size > dyn.cls_max_size
        ):
            cls_map[labels == c] = CLS_INVALID
            continue

        bound = int((obb_size + dyn.cls_max_explore_distance) / VOXEL)
        assert 2 * bound + 1 <= submap, "fuzz must stay inside the submap"
        connected_any = False
        member_demotions = []
        for z, y, x in zip(zz, yy, xx):
            conn, explored = explore_to_ground_np(
                vals, (x, y, z), dyn.thr_frontiers, dyn.thr_new_obstacles,
                bound,
            )
            if conn:
                connected_any = True
                break
            member_demotions.extend(explored)
        if connected_any:
            cls_map[labels == c] = CLS_UNKNOWN
        else:
            cls_map[labels == c] = CLS_MAV
            demoted.update(member_demotions)
    return cls_map, demoted, skip


def test_classify_fuzz_200_random_scenes(rng):
    cfg = VoFODConfig(
        max_clusters=8,
        max_far_voxels=256,
        max_queries=128,
        explore_submap=16,
    )
    grid = GridSpec(origin=(0.0, 0.0, 0.0), shape=SHAPE, voxel_size=VOXEL)
    dyn_obj = DynParams(
        cls_min_points=2.0,
        cls_max_size=2.6,
        cls_max_distance=4.2,
        # keeps the explore bound <= submap//2 - 1 = 7 for every cluster
        # passing the size gate, so the submap clamp never engages
        cls_max_explore_distance=1.0,
    )
    dyn = dyn_obj.as_arrays()
    sensor_pos = np.array([3.5, 3.0, 2.5], np.float32)

    fn = jax.jit(
        lambda vals, far, labels: classify(
            cfg, dyn, grid, vals, far, labels, jnp.bool_(True),
            jnp.asarray(sensor_pos), jnp.bool_(True), jnp.bool_(True),
        )
    )

    checked_clusters = 0
    checked_demotions = 0
    # three field regimes: pure air (clump cells become isolated unknown
    # pockets -> floating clusters + demotion sets), unknown-dominant
    # (percolates to the shell -> grounded), balanced
    regimes = [(1.0, 1.0), (0.20, 0.60), (0.45, 0.85)]
    for case in range(N_CASES):
        # value field: air / unknown band / ground mix
        p_air, p_unk = regimes[case % len(regimes)]
        u = rng.random(SHAPE)
        vals = np.where(
            u < p_air, -900.0, np.where(u < p_unk, -500.0, -100.0)
        ).astype(np.float32)
        # far voxels: a few small clumps
        far = np.zeros(SHAPE, bool)
        for _ in range(rng.integers(1, 4)):
            cz, cy, cx = (
                rng.integers(0, SHAPE[0]),
                rng.integers(0, SHAPE[1]),
                rng.integers(0, SHAPE[2]),
            )
            for _ in range(rng.integers(1, 5)):
                dz, dy, dx = rng.integers(-1, 2, size=3)
                z, y, x = np.clip(
                    [cz + dz, cy + dy, cx + dx], 0,
                    np.array(SHAPE) - 1,
                )
                far[z, y, x] = True
        if case % len(regimes) == 0:
            # pure-air regime: the clump cells themselves form the unknown
            # pocket — enclosed by air, so the explore terminates without
            # shell contact and the cluster is floating with a demotion set
            vals[far] = -500.0

        labels, _, conv, _ = label_components_seeded(
            jnp.asarray(far), jnp.zeros(SHAPE, bool), RADIUS, 64
        )
        assert bool(conv)
        out = fn(jnp.asarray(vals), jnp.asarray(far), labels)
        assert not bool(out.far_overflow), "fuzz sized under the caps"

        # per-voxel class map from the slot table
        got_cls = np.full(SHAPE, -1, np.int32)
        reps = np.asarray(out.reps)
        ccls = np.asarray(out.cluster_class)
        lab = np.asarray(out.labels)
        for k in range(cfg.max_clusters):
            if reps[k] < int(SENTINEL):
                got_cls[lab == reps[k]] = ccls[k]

        want_cls, want_demoted, skip = _oracle_case(
            vals, far, sensor_pos, dyn_obj, cfg.explore_submap
        )
        if skip.any():
            # OBB-degenerate or razor-edge gate: legitimately uncomparable
            continue
        np.testing.assert_array_equal(
            got_cls[far], want_cls[far],
            err_msg=f"class mismatch in case {case}",
        )
        checked_clusters += int(far.sum() > 0)

        # demotion set: exactly the oracle's voxels moved to the frontiers
        # score, everything else untouched
        new_vals = np.asarray(out.grid)
        want_vals = vals.copy()
        for x, y, z in want_demoted:
            want_vals[z, y, x] = min(
                want_vals[z, y, x], float(dyn_obj.thr_frontiers)
            )
        np.testing.assert_allclose(new_vals, want_vals, atol=1e-5,
                                   err_msg=f"demotion mismatch in case {case}")
        checked_demotions += len(want_demoted)

    # the fuzz actually exercised the interesting paths
    assert checked_clusters > 100
    assert checked_demotions > 50


def test_explore_tier_ladder_invariance(rng):
    """The tiered explore fast path is a pure capacity optimization: for any
    tier ladder (including none), classify() output is IDENTICAL — queries
    fill in ascending order and each query's bounded BFS is independent
    (config.py explore_fast_queries; the ladder picks the smallest capacity
    that fits the scan's query count)."""
    grid = GridSpec(origin=(0.0, 0.0, 0.0), shape=SHAPE, voxel_size=VOXEL)
    base = dict(
        max_clusters=8,
        max_far_voxels=256,
        max_queries=40,
        explore_submap=16,
    )
    ladders = [0, (8, 16), (3, 7, 21), 16, (40,)]
    cfgs = [
        VoFODConfig(explore_fast_queries=t, **base) for t in ladders
    ]
    dyn_obj = DynParams(
        cls_min_points=1.0,
        cls_max_size=30.0,  # permissive: member counts == query counts
        cls_max_distance=40.0,
        cls_max_explore_distance=1.0,
    )
    dyn = dyn_obj.as_arrays()
    sensor_pos = np.array([3.5, 3.0, 2.5], np.float32)
    fns = [
        jax.jit(
            lambda vals, far, labels, _cfg=cfg: classify(
                _cfg, dyn, grid, vals, far, labels, jnp.bool_(True),
                jnp.asarray(sensor_pos), jnp.bool_(True), jnp.bool_(True),
            )
        )
        for cfg in cfgs
    ]

    # controlled query counts hit every tier boundary of every ladder —
    # n member voxels of one gated cluster => qtotal == n — plus an
    # overflow case (qtotal > max_queries => conservative unknown)
    sizes = [1, 3, 4, 7, 8, 9, 16, 17, 21, 22, 40, 41]
    for n in sizes:
        vals = np.full(SHAPE, -500.0, np.float32)  # unknown band everywhere
        far = np.zeros(SHAPE, bool)
        flat = rng.permutation(int(np.prod(SHAPE)))[:n]
        zz, yy, xx = np.unravel_index(flat, SHAPE)
        far[zz, yy, xx] = True
        labels, _, conv, _ = label_components_seeded(
            jnp.asarray(far), jnp.zeros(SHAPE, bool), RADIUS, 64
        )
        assert bool(conv)
        outs = [
            fn(jnp.asarray(vals), jnp.asarray(far), labels) for fn in fns
        ]
        ref = outs[0]
        for ladder, out in zip(ladders[1:], outs[1:]):
            for field, a, b in zip(ref._fields, ref, out):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"{field} differs for ladder {ladder} at n={n}",
                )
