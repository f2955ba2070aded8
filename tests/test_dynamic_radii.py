"""Live-tunable stencil radii (cfg.dynamic_radii): the two reference
dynamic_reconfigure params that shape stencils — ground_points_max_distance
and sepclusters/max_bg_distance (DetectionParams.cfg:16-44) — move into
DynParams: the stencils compile once at the static *_bound radii and gate
taps by a traced r² compare (ops/morphology._ball_pool_traced).

Contract (VERDICT round-2 item 4): changing both between steps must not
retrace (same jit cache entry), and results at every radius must equal the
static pipeline compiled at that radius.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.ops.morphology import (
    ball_pool_max,
    ball_pool_max_traced,
    ball_pool_min,
    ball_pool_min_traced,
    ball_pool_sum,
    ball_pool_sum_traced,
)
from vofod_tpu.pipeline.state import ScanInput, init_state
from vofod_tpu.pipeline.step import make_step_fn
from vofod_tpu.sensor import make_lut


class TestTracedPools:
    @pytest.mark.parametrize("radius", [1.0, 1.6, 2.0, 2.9, 3.0])
    def test_match_static_pools(self, rng, radius):
        a = jnp.asarray(rng.integers(-50, 50, (12, 13, 14)).astype(np.int32))
        r2 = jnp.float32(radius * radius)
        for static, traced in [
            (ball_pool_min, ball_pool_min_traced),
            (ball_pool_max, ball_pool_max_traced),
            (ball_pool_sum, ball_pool_sum_traced),
        ]:
            want = static(a, radius)
            got = traced(a, r2, 3.0)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _cfg(**kw):
    d = dict(
        sensor=SensorConfig(
            vertical_rays=16, horizontal_rays=64, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 5.75), (16.0, 16.0, 11.5)),
        background_sufficient_points_ratio=0.05,
        max_clusters=8,
        max_far_voxels=512,
        max_queries=64,
        explore_submap=16,
        confidence_submap=8,
    )
    d.update(kw)
    return VoFODConfig(**d)


def _scans(cfg, n=6):
    lut = make_lut(cfg.sensor)
    out = []
    for i in range(n):
        th = 0.3 * i
        pose = hover_pose((np.cos(th), np.sin(th), 7.0), yaw=0.1 * i)
        scene = Scene(ground_z=0.5)
        scene.add_sphere(center=(4.0, 0.3 * np.sin(th), 9.0), radius=0.7)
        r = render_scan(scene, lut, pose)
        out.append(
            ScanInput(
                ranges_mm=jnp.asarray(r.astype(np.float32)),
                intensity=jnp.ones(r.size, jnp.float32),
                pose=jnp.asarray(pose),
            )
        )
    return lut, out


def _run(step, cfg, dyn, scans):
    state = init_state(cfg, dyn)
    state = state._replace(grid=state.grid.at[1, :, :].set(jnp.inf))
    outs = []
    for scan in scans:
        state, out = step(state, scan, dyn.as_arrays())
        outs.append(out)
    return state, outs


class TestDynamicRadiiStep:
    @pytest.mark.parametrize(
        "gpmd,max_bg", [(1.5, 0.8), (1.0, 0.8), (2.0, 1.4), (1.5, 1.9)]
    )
    def test_matches_static_at_radius(self, gpmd, max_bg):
        """dynamic(r) == static-compiled-at-r for every output, per scan."""
        dcfg = _cfg(
            dynamic_radii=True,
            ground_points_max_distance_bound=2.0,
            sepclusters_max_bg_distance_bound=2.0,
        )
        scfg = _cfg(
            ground_points_max_distance=gpmd,
            sepclusters_max_bg_distance=max_bg,
        )
        lut, scans = _scans(dcfg)
        dyn = DynParams(
            raycast_weight_coefficient=0.5,
            ground_points_max_distance=gpmd,
            sepclusters_max_bg_distance=max_bg,
        )
        dstep = make_step_fn(dcfg, lut, donate=False)
        sstep = make_step_fn(scfg, lut, donate=False)
        dstate, douts = _run(dstep, dcfg, dyn, scans)
        sstate, souts = _run(sstep, scfg, dyn, scans)
        with np.errstate(invalid="ignore"):
            both_inf = np.isinf(np.asarray(dstate.grid)) & np.isinf(
                np.asarray(sstate.grid)
            )
            diff = np.where(
                both_inf, 0.0, np.asarray(dstate.grid) - np.asarray(sstate.grid)
            )
        np.testing.assert_allclose(diff, 0.0, atol=1e-5)
        for i, (do, so) in enumerate(zip(douts, souts)):
            for name in so.detections._fields:
                a = np.asarray(getattr(do.detections, name))
                b = np.asarray(getattr(so.detections, name))
                if a.dtype.kind == "f":
                    np.testing.assert_allclose(
                        a, b, rtol=1e-5, atol=1e-6,
                        err_msg=f"scan {i}: detections.{name}",
                    )
                else:
                    np.testing.assert_array_equal(
                        a, b, err_msg=f"scan {i}: detections.{name}"
                    )
            assert int(do.diag.n_far) == int(so.diag.n_far), i

    def test_no_retrace_on_radius_change(self):
        """Changing both radii between steps reuses the SAME compiled
        executable — one jit cache entry across all values."""
        cfg = _cfg(
            dynamic_radii=True,
            ground_points_max_distance_bound=2.0,
            sepclusters_max_bg_distance_bound=2.0,
        )
        lut, scans = _scans(cfg, n=3)
        step = make_step_fn(cfg, lut, donate=False)
        base = DynParams(raycast_weight_coefficient=0.5)
        state = init_state(cfg, base)
        for scan, (g, s) in zip(scans, [(1.5, 0.8), (1.0, 1.4), (2.0, 1.9)]):
            dyn = dataclasses.replace(
                base,
                ground_points_max_distance=g,
                sepclusters_max_bg_distance=s,
            )
            state, _ = step(state, scan, dyn.as_arrays())
        assert step._cache_size() == 1

    def test_update_params_guard(self):
        """Without dynamic_radii the node rejects changes to the two static
        stencil radii instead of silently ignoring them (round-2 weak #4)."""
        from vofod_tpu.runtime.node import VoFOD

        cfg = _cfg()
        node = VoFOD(cfg, DynParams())
        with pytest.raises(ValueError, match="dynamic_radii"):
            node.update_params(ground_points_max_distance=2.0)
        with pytest.raises(ValueError, match="dynamic_radii"):
            node.update_params(sepclusters_max_bg_distance=1.4)
        node.update_params(thr_new_obstacles=-250.0)  # normal params fine

    def test_unsupported_combos_raise(self):
        cfg = _cfg(dynamic_radii=True, sepclusters_exact_census=True)
        lut = make_lut(cfg.sensor)
        with pytest.raises(NotImplementedError, match="dynamic_radii"):
            make_step_fn(cfg, lut)
