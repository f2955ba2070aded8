"""Scenario tests: multi-target, gate rejections, edge cases, live tuning."""

import dataclasses

import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.runtime.node import NodeOptions, VoFOD


def make_node(**kw):
    cfg = VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=32, horizontal_rays=256, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 4.0), (40.0, 40.0, 20.0)),
        background_sufficient_points_ratio=0.05,
        max_clusters=8,
        max_queries=128,
        **kw.pop("cfg_kw", {}),
    )
    node = VoFOD(cfg, kw.pop("dyn", DynParams()), NodeOptions(**kw))
    xs = np.arange(-6.0, 6.0, 0.4)
    gx, gy = np.meshgrid(xs, xs)
    node.load_apriori_map(
        np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=1)
    )
    return node


def warm(node, pose, n=25):
    empty = render_scan(Scene(ground_z=0.0), node.lut, pose)
    for _ in range(n):
        node.process_scan(empty, None, pose)
    return empty


class TestMultiTarget:
    def test_two_targets_two_detections(self):
        node = make_node()
        pose = hover_pose((0.0, 0.0, 3.0))
        warm(node, pose)
        sc = Scene(ground_z=0.0)
        sc.add_sphere(center=(8.0, 0.0, 5.0), radius=0.5)
        sc.add_sphere(center=(0.0, 9.0, 6.0), radius=0.5)
        tgt = render_scan(sc, node.lut, pose)
        msg = None
        for _ in range(5):
            msg = node.process_scan(tgt, None, pose)
        assert len(msg.detections) == 2
        centers = [np.array([8.0, 0.0, 5.0]), np.array([0.0, 9.0, 6.0])]
        for d in msg.detections:
            errs = [np.linalg.norm(np.array(d.position) - c) for c in centers]
            assert min(errs) < 1.0


class TestMovingSensor:
    def test_orbiting_sensor_detects_target(self):
        """The sensor flies an arc while the target hovers: the map must
        integrate consistently across viewpoints (raycast origin moves) and
        still isolate the floating target."""
        node = make_node()
        # warm from several viewpoints on an arc of radius 3 m
        poses = [
            hover_pose(
                (3.0 * np.cos(a), 3.0 * np.sin(a), 3.0 + 0.2 * np.sin(2 * a)),
                yaw=a,
            )
            for a in np.linspace(0, np.pi, 24)
        ]
        for p in poses:
            node.process_scan(
                render_scan(Scene(ground_z=0.0), node.lut, p), None, p
            )
        sc = Scene(ground_z=0.0)
        sc.add_sphere(center=(8.0, 0.0, 5.0), radius=0.5)
        msg = None
        for p in poses[:4]:
            msg = node.process_scan(render_scan(sc, node.lut, p), None, p)
        assert len(msg.detections) == 1
        pos = np.array(msg.detections[0].position)
        assert np.linalg.norm(pos - [8.0, 0.0, 5.0]) < 1.0


class TestGateRejections:
    def test_oversized_cluster_rejected(self):
        node = make_node()
        pose = hover_pose((0.0, 0.0, 3.0))
        warm(node, pose)
        sc = Scene(ground_z=0.0)
        sc.add_sphere(center=(8.0, 0.0, 6.5), radius=2.5)  # diag > max_size
        tgt = render_scan(sc, node.lut, pose)
        for _ in range(5):
            msg = node.process_scan(tgt, None, pose)
        assert len(msg.detections) == 0

    def test_beyond_max_distance_rejected(self):
        node = make_node()
        pose = hover_pose((0.0, 0.0, 3.0))
        warm(node, pose)
        node.update_params(cls_max_distance=6.0)  # target at 8+ m now too far
        sc = Scene(ground_z=0.0)
        sc.add_sphere(center=(8.0, 0.0, 5.0), radius=0.5)
        tgt = render_scan(sc, node.lut, pose)
        for _ in range(5):
            msg = node.process_scan(tgt, None, pose)
        assert len(msg.detections) == 0
        # restoring the gate re-enables detection without recompilation
        node.update_params(cls_max_distance=50.0)
        for _ in range(2):
            msg = node.process_scan(tgt, None, pose)
        assert len(msg.detections) == 1


class TestLiveTuning:
    def test_raycast_pause_stops_clearing(self):
        node = make_node(dyn=dataclasses.replace(DynParams(), raycast_pause=True))
        pose = hover_pose((0.0, 0.0, 3.0))
        warm(node, pose, n=10)
        vals = np.asarray(node.state.grid)
        # air around the sensor is only ever touched by the freespace raycast
        # (sepclusters demotions happen near disconnected background, far
        # away): with the raycast paused it must stay at the init score
        g = node.grid_spec
        ix = int((0.0 - g.origin[0]) / g.voxel_size)
        iy = int((0.0 - g.origin[1]) / g.voxel_size)
        iz = int((3.0 - g.origin[2]) / g.voxel_size)
        near = vals[iz - 2 : iz + 3, iy - 2 : iy + 3, ix - 2 : ix + 3]
        np.testing.assert_array_equal(near, -740.0)
        # control: with the raycast active the same region clears
        node2 = make_node()
        warm(node2, pose, n=10)
        vals2 = np.asarray(node2.state.grid)
        near2 = vals2[iz - 2 : iz + 3, iy - 2 : iy + 3, ix - 2 : ix + 3]
        assert near2.min() < -741.0

    def test_old_update_rule_also_clears(self):
        node = make_node(
            dyn=dataclasses.replace(
                DynParams(), raycast_new_update_rule=False,
                raycast_weight_coefficient=0.05,
            )
        )
        pose = hover_pose((0.0, 0.0, 3.0))
        warm(node, pose, n=15)
        vals = np.asarray(node.state.grid)
        assert vals[np.isfinite(vals)].min() < -741.0


class TestNearGround:
    def test_low_hovering_object_is_background(self):
        """An object within ground_points_max_distance of the background is a
        close cluster — absorbed into the map, never detected (ref
        findCloseFarClusters semantics)."""
        node = make_node()
        pose = hover_pose((0.0, 0.0, 3.0))
        warm(node, pose)
        sc = Scene(ground_z=0.0)
        sc.add_sphere(center=(5.0, 0.0, 1.0), radius=0.4)  # 1 m above ground
        tgt = render_scan(sc, node.lut, pose)
        for _ in range(5):
            msg = node.process_scan(tgt, None, pose)
        assert len(msg.detections) == 0
        # and the object's voxels have been absorbed as background
        g = node.grid_spec
        ix = int((4.6 - g.origin[0]) / g.voxel_size)
        iy = int((0.0 - g.origin[1]) / g.voxel_size)
        iz = int((1.0 - g.origin[2]) / g.voxel_size)
        vals = np.asarray(node.state.grid)
        assert vals[iz - 1 : iz + 2, iy - 1 : iy + 2, ix - 1 : ix + 2].max() > -300.0


class TestEdgeCases:
    def test_all_zero_scan_is_harmless(self):
        node = make_node()
        pose = hover_pose((0.0, 0.0, 3.0))
        msg = node.process_scan(
            np.zeros(node.cfg.sensor.n_points, np.uint32), None, pose
        )
        assert msg.detections == []
        assert int(node.last_diag.n_occupied) == 0

    def test_sensor_outside_grid_skips_raycast(self):
        node = make_node()
        pose = hover_pose((500.0, 0.0, 3.0))  # outside the operation area
        sc = Scene(ground_z=0.0)
        r = render_scan(sc, node.lut, pose)
        v0 = np.asarray(node.state.grid).copy()
        node.process_scan(r, None, pose)
        v1 = np.asarray(node.state.grid)
        # no clearing happened (no voxel moved below init toward ray score)
        finite = v1[np.isfinite(v1)]
        assert finite.min() >= -741.0

    def test_wrong_scan_size_raises(self):
        node = make_node()
        with pytest.raises(ValueError):
            node.process_scan(np.zeros(17, np.uint32), None, np.eye(4))
