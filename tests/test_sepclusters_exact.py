"""Exact-census separated-background maintenance vs verbatim oracles.

Covers the reference path ref vofod_nodelet.cpp:1124-1294 bit-for-bit:
coarse VoxelGridCounted binning (incl. the 4th-pass indexing quirk,
voxel_grid_counted.cpp:185-187), per-component sure census, and the
sequential ball demotion (overlap -> w1^k).
"""


import jax.numpy as jnp
import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.ops.binning import voxel_grid_counted
from vofod_tpu.pipeline.sepclusters import run_sepclusters, run_sepclusters_exact

from oracles import sepclusters_exact_np, voxel_grid_counted_quirk_np


def _cfg(**kw):
    return VoFODConfig(
        sensor=SensorConfig(vertical_rays=8, horizontal_rays=16),
        oparea=Box((0, 0, 4), (12.0, 12.0, 12.0)),
        **kw,
    )


class TestCountedQuirk:
    def test_quirk_matches_verbatim_oracle(self, rng):
        """Shuffled input order: the quirk permutes per-cell sure counts;
        both implementations must agree cell-for-cell."""
        pts = rng.uniform(0, 8, size=(300, 3)).astype(np.float32)
        inten = rng.uniform(-1, 1, size=300).astype(np.float32)
        valid = rng.random(300) < 0.9
        counts, sure = voxel_grid_counted(
            jnp.asarray(pts), jnp.asarray(inten), jnp.asarray(valid),
            leaf_size=2.0, threshold=0.3, out_shape=(4, 4, 4),
            compat_indexing=True,
        )
        want_c, want_s = voxel_grid_counted_quirk_np(
            pts, inten, valid, 2.0, 0.3, (0.0, 0.0, 0.0), (4, 4, 4)
        )
        np.testing.assert_array_equal(np.asarray(counts), want_c)
        np.testing.assert_array_equal(np.asarray(sure), want_s)

    def test_quirk_differs_from_spec_but_preserves_total(self, rng):
        """The quirk is a real behavioral divergence (counts permuted across
        cells) unless the input happens to be cell-sorted."""
        pts = rng.uniform(0, 8, size=(200, 3)).astype(np.float32)
        inten = rng.uniform(-1, 1, size=200).astype(np.float32)
        v = np.ones(200, bool)
        kw = dict(leaf_size=2.0, threshold=0.0, out_shape=(4, 4, 4))
        _, spec = voxel_grid_counted(
            jnp.asarray(pts), jnp.asarray(inten), jnp.asarray(v), **kw)
        _, quirk = voxel_grid_counted(
            jnp.asarray(pts), jnp.asarray(inten), jnp.asarray(v),
            compat_indexing=True, **kw)
        spec, quirk = np.asarray(spec), np.asarray(quirk)
        assert spec.sum() == quirk.sum()
        assert (spec != quirk).any()


class TestExactCensus:
    def test_sparse_large_cluster_activates_only_in_exact_mode(self):
        """A background cluster with >= min_sure_points sure voxels spread too
        thinly for any local ball to reach the count: the reference censuses
        the whole cluster (ref :1174-1183) and activates classification; the
        local-density fast mode does not (documented deviation)."""
        cfg = _cfg()
        dyn = DynParams().as_arrays()  # min_sure_points = 24
        vals = np.full(cfg.grid_shape, -740.0, np.float32)
        # two long connected chains of bg voxels along x with every other
        # voxel "sure": any r<=3 ball sees <= 5 sure voxels (far below 24),
        # but the bridged component holds 24 sure voxels in total
        for y in (8, 11):
            vals[4, y, 1:25] = -200.0  # bg, connected (spacing 1)
            vals[4, y, 1:25:2] = 0.0  # 12 sure per row
        # rows y=8 and y=11 are NOT ball-2 adjacent (dy=3 > 2) -> two clusters
        # of 12 sure each; bridge them to make one cluster with 24 sure:
        vals[4, 9, 12] = -200.0
        vals[4, 10, 12] = -200.0

        fast = run_sepclusters(
            cfg, dyn, jnp.asarray(vals), jnp.zeros(cfg.grid_shape, bool),
            jnp.float32(1.0),
        )
        assert not bool(fast.sure_bg_sufficient)

        exact = run_sepclusters_exact(
            cfg, dyn, jnp.asarray(vals), jnp.zeros(cfg.grid_shape, bool),
            jnp.float32(1.0),
        )
        assert bool(exact.sure_bg_sufficient)
        assert bool(exact.converged)

    @pytest.mark.parametrize("quirk", [False, True])
    def test_matches_verbatim_oracle(self, rng, quirk):
        """Random sparse scene vs the line-by-line NumPy reference
        (ref vofod_nodelet.cpp:1124-1294), both indexing modes."""
        cfg = _cfg(compat_counted_indexing=quirk)
        dyn_obj = DynParams()
        dyn = dyn_obj.as_arrays()
        shape = cfg.grid_shape
        vals = np.full(shape, -740.0, np.float32)
        # a sure slab (the anchor cluster), a sparse unsure clump, noise
        vals[2:4, 2:8, 2:8] = 0.0
        idx = rng.integers(0, np.prod(shape), size=60)
        flat = vals.reshape(-1)
        flat[idx] = rng.choice([-200.0, -50.0, 0.5], size=60).astype(np.float32)
        vals = flat.reshape(shape)

        out = run_sepclusters_exact(
            cfg, dyn, jnp.asarray(vals), jnp.zeros(shape, bool),
            jnp.float32(1.0),
        )
        assert bool(out.converged)
        want, want_suff = sepclusters_exact_np(
            vals,
            thr_new=dyn_obj.thr_new_obstacles,
            thr_sure=dyn_obj.thr_sure_obstacles,
            min_sure_points=dyn_obj.sepclusters_min_sure_points,
            max_dist_idx=cfg.sepclusters_max_bg_distance / cfg.voxel_size,
            score_ray=dyn_obj.score_ray,
            its_diff=1.0,
            quirk_indexing=quirk,
        )
        assert bool(out.sure_bg_sufficient) == want_suff
        np.testing.assert_allclose(np.asarray(out.grid), want, rtol=1e-5,
                                   atol=1e-4)

    def test_step_dispatch(self):
        """cfg.sepclusters_exact_census routes run_sepclusters to the exact
        path (same call signature as the step uses)."""
        cfg = _cfg(sepclusters_exact_census=True)
        dyn = DynParams().as_arrays()
        vals = np.full(cfg.grid_shape, -740.0, np.float32)
        vals[4, 4:12, 4:12] = 0.0  # dense sure slab: both modes agree
        out = run_sepclusters(
            cfg, dyn, jnp.asarray(vals), jnp.zeros(cfg.grid_shape, bool),
            jnp.float32(1.0),
        )
        assert bool(out.sure_bg_sufficient)
        assert np.asarray(out.grid)[4, 8, 8] == 0.0


class TestCoarseLeafBoundary:
    def test_out_of_grid_center_still_demotes(self):
        """lsz >= 2 regression: a boundary coarse cell's integer center can
        fall OUTSIDE the fine grid while its demotion ball reaches in-grid
        voxels — the reference bounds-checks per offset around the
        (possibly out-of-grid) center (ref vofod_nodelet.cpp:1253-1260).
        With sepclusters_max_bg_distance=1.3 (mv=3, leaf=2) an unsure bg
        voxel on the top plane must still be decayed."""
        cfg = _cfg(sepclusters_max_bg_distance=1.3)
        dyn_obj = DynParams()
        dyn = dyn_obj.as_arrays()
        shape = cfg.grid_shape
        vals = np.full(shape, -740.0, np.float32)
        vals[2:4, 2:10, 2:10] = 0.0  # sure anchor cluster
        vals[shape[0] - 1, 20, 20] = -200.0  # isolated unsure bg at the top

        out = run_sepclusters_exact(
            cfg, dyn, jnp.asarray(vals), jnp.zeros(shape, bool),
            jnp.float32(1.0),
        )
        want, want_suff = sepclusters_exact_np(
            vals,
            thr_new=dyn_obj.thr_new_obstacles,
            thr_sure=dyn_obj.thr_sure_obstacles,
            min_sure_points=dyn_obj.sepclusters_min_sure_points,
            max_dist_idx=cfg.sepclusters_max_bg_distance / cfg.voxel_size,
            score_ray=dyn_obj.score_ray,
            its_diff=1.0,
            quirk_indexing=False,
        )
        assert want_suff
        # the boundary voxel was demoted by the oracle; we must match
        assert want[shape[0] - 1, 20, 20] < -200.0
        assert bool(out.sure_bg_sufficient) == want_suff
        np.testing.assert_allclose(np.asarray(out.grid), want, rtol=1e-5,
                                   atol=1e-4)

    def test_matches_verbatim_oracle_leaf2(self, rng):
        """Random scene at lsz=2 (non-identity coarse binning) vs the
        verbatim oracle."""
        cfg = _cfg(sepclusters_max_bg_distance=1.3)
        dyn_obj = DynParams()
        dyn = dyn_obj.as_arrays()
        shape = cfg.grid_shape
        vals = np.full(shape, -740.0, np.float32)
        vals[2:4, 2:8, 2:8] = 0.0
        idx = rng.integers(0, np.prod(shape), size=80)
        flat = vals.reshape(-1)
        flat[idx] = rng.choice([-200.0, -50.0, 0.5], size=80).astype(np.float32)
        vals = flat.reshape(shape)

        out = run_sepclusters_exact(
            cfg, dyn, jnp.asarray(vals), jnp.zeros(shape, bool),
            jnp.float32(1.0),
        )
        want, want_suff = sepclusters_exact_np(
            vals,
            thr_new=dyn_obj.thr_new_obstacles,
            thr_sure=dyn_obj.thr_sure_obstacles,
            min_sure_points=dyn_obj.sepclusters_min_sure_points,
            max_dist_idx=cfg.sepclusters_max_bg_distance / cfg.voxel_size,
            score_ray=dyn_obj.score_ray,
            its_diff=1.0,
            quirk_indexing=False,
        )
        assert bool(out.sure_bg_sufficient) == want_suff
        np.testing.assert_allclose(np.asarray(out.grid), want, rtol=1e-5,
                                   atol=1e-4)
