"""pc_loader (native + numpy), scan queue, mask creator, viz, sensor model."""

import numpy as np
import pytest

from vofod_tpu.io.pc_loader import _load_cloud_np, _native_lib, load_cloud, save_cloud
from vofod_tpu.io.scan_queue import ScanQueue
from vofod_tpu.runtime.mask_creator import MaskCreator
from vofod_tpu.runtime.viz import (
    border_marker,
    hsv_to_rgb,
    lidar_ray_markers,
    voxel_markers,
)
from vofod_tpu.sensor import (
    check_sensor_params,
    destagger,
    load_mask,
    make_lut_ouster,
    make_lut_simulation,
)


class TestPcLoader:
    def _roundtrip(self, tmp_path, name, header):
        pts = np.array([[1.5, -2.0, 3.25], [0.0, 0.5, -1.0], [9, 8, 7]], np.float32)
        p = str(tmp_path / name)
        save_cloud(p, pts, pts_header=header)
        got = load_cloud(p)
        np.testing.assert_allclose(got, pts)
        got_np = _load_cloud_np(p)
        np.testing.assert_allclose(got_np, pts)

    def test_pts_roundtrip(self, tmp_path):
        self._roundtrip(tmp_path, "cloud.pts", True)

    def test_txt_roundtrip(self, tmp_path):
        self._roundtrip(tmp_path, "cloud.txt", False)

    def test_native_loader_available_and_matches(self, tmp_path):
        assert _native_lib() is not None, "native lib must be built"
        pts = np.random.default_rng(1).normal(size=(500, 3)).astype(np.float32)
        p = str(tmp_path / "big.pts")
        save_cloud(p, pts)
        native = load_cloud(p, use_native=True)
        fallback = load_cloud(p, use_native=False)
        np.testing.assert_allclose(native, fallback, rtol=1e-5)

    def test_extra_columns_ignored(self, tmp_path):
        p = str(tmp_path / "c.txt")
        with open(p, "w") as f:
            f.write("1 2 3 255 0 0\n4 5 6 0 255 0\n")
        got = load_cloud(p)
        np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6]])

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            load_cloud("/nonexistent/file.pts")


class TestScanQueue:
    def test_fifo_and_drop(self):
        q = ScanQueue(n_points=16, capacity=2)
        r0 = np.arange(16, dtype=np.uint32)
        pose = np.eye(4, dtype=np.float32)
        sig = np.linspace(0.0, 200.0, 16, dtype=np.float32)
        assert q.push(r0, pose, intensity=sig)
        assert q.push(r0 + 1, pose)  # no intensity channel -> all-ones
        assert not q.push(r0 + 2, pose)  # full -> dropped
        assert q.dropped == 1
        a, w, p = q.pop()
        np.testing.assert_array_equal(a, r0)
        np.testing.assert_array_equal(w, sig)
        np.testing.assert_array_equal(p, pose)
        b, w1, _ = q.pop()
        np.testing.assert_array_equal(b, r0 + 1)
        np.testing.assert_array_equal(w1, np.ones(16, np.float32))
        assert q.pop() is None

    def test_threaded_producer(self):
        import threading

        q = ScanQueue(n_points=8, capacity=64)
        N = 50

        def produce():
            for i in range(N):
                while not q.push(np.full(8, i, np.uint32), np.eye(4)):
                    pass

        t = threading.Thread(target=produce)
        t.start()
        got = []
        while len(got) < N:
            item = q.pop()
            if item is not None:
                got.append(int(item[0][0]))
        t.join()
        assert got == list(range(N))


class TestMaskCreator:
    def test_accumulates_zero_range_pixels(self):
        mc = MaskCreator(4, 8)
        r1 = np.ones(32, np.uint32) * 1000
        r1[3] = 0
        r2 = np.ones(32, np.uint32) * 1000
        r2[7] = 0
        mc.add_scan(r1)
        mc.add_scan(r2)
        m = mc.mask().reshape(-1)
        assert m[3] == 0 and m[7] == 0
        assert m.sum() == 30
        mc.reset()
        assert mc.mask().sum() == 32 and mc.n_scans == 0

    def test_save_npy_roundtrip(self, tmp_path):
        from vofod_tpu.sensor import load_mask

        mc = MaskCreator(4, 8)
        r = np.ones(32, np.uint32)
        r[5] = 0
        mc.add_scan(r)
        p = str(tmp_path / "mask.npy")
        mc.save(p)
        loaded = load_mask(p, 8, 4)
        assert loaded[5] == 0 and loaded.sum() == 31


class TestSensor:
    def test_sim_lut_reconstruction(self):
        lut = make_lut_simulation(64, 16, np.deg2rad(90.0))
        r = np.full(64 * 16, 5000, np.uint32)
        pts = lut.directions * 5.0 + lut.offsets
        assert check_sensor_params(lut, pts, r)
        # perturbed points must fail
        bad = pts + 0.01
        assert not check_sensor_params(lut, bad, r)

    def test_ouster_lut_reconstruction(self):
        H, W = 8, 32
        alt = np.linspace(-20, 20, H)
        az = np.linspace(-2, 2, H)
        lut = make_lut_ouster(W, H, az, alt, lidar_origin_to_beam_origin_mm=15.0)
        # directions normalized; offsets small
        np.testing.assert_allclose(
            np.linalg.norm(lut.directions, axis=1), 1.0, atol=1e-5
        )
        assert np.abs(lut.offsets).max() < 0.05

    def test_destagger(self):
        img = np.arange(12).reshape(3, 4)
        out = destagger(img, [0, 1, 2])
        np.testing.assert_array_equal(out[0], img[0])
        np.testing.assert_array_equal(out[1], [5, 6, 7, 4])
        np.testing.assert_array_equal(out[2], [10, 11, 8, 9])

    def test_mask_missing_gives_ones(self):
        m = load_mask("/no/such/mask.png", 16, 4)
        assert m.shape == (64,) and m.all()

    def test_mask_mangled_column_major(self, tmp_path):
        # reference layout quirk: mangled mask index = vv*H + u (:536-541)
        H, W = 2, 4
        mask = np.ones((H, W), np.uint8)
        mask[1, 2] = 0
        p = str(tmp_path / "m.npy")
        np.save(p, mask)
        out = load_mask(p, W, H, pixel_shift_by_row=[0, 1], mangle=True)
        # u=1, v=2 -> vv=(2+1)%4=3 -> index 3*2+1 = 7
        assert out[7] == 0
        assert out.sum() == H * W - 1


class TestVoxelExports:
    def test_frontier_markers_band(self):
        from vofod_tpu.geometry import GridSpec
        from vofod_tpu.runtime.viz import frontier_markers

        g = GridSpec((0, 0, 0), (4, 4, 4), 0.5)
        vals = np.full((4, 4, 4), -1000.0, np.float32)
        vals[1, 1, 1] = -740.0  # in band
        vals[2, 2, 2] = -100.0  # above band
        m = frontier_markers(vals, g, -750.0, -300.0)
        assert len(m.points) == 1
        np.testing.assert_allclose(m.points[0], [0.75, 0.75, 0.75])

    def test_node_export_voxels(self):
        from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
        from vofod_tpu.runtime.node import NodeOptions, VoFOD

        cfg = VoFODConfig(
            sensor=SensorConfig(vertical_rays=8, horizontal_rays=32),
            oparea=Box((0, 0, 4), (8.0, 8.0, 8.0)),
            max_clusters=4, max_far_voxels=128, max_queries=32,
            explore_submap=8, confidence_submap=8,
        )
        node = VoFOD(cfg, DynParams(), NodeOptions(raycast_mode="off"))
        node.load_apriori_map(np.array([[1.0, 1.0, 1.0]]))
        bg = node.export_voxels(-300.0, above=True)
        assert bg.shape == (1, 3)
        air = node.export_voxels(-300.0, above=False)
        assert len(air) == cfg.n_voxels - 1


class TestVizConfig:
    def test_shipped_yaml_matches_reference_palette(self):
        import pathlib

        from vofod_tpu.runtime.viz import load_viz_config

        path = (
            pathlib.Path(__file__).resolve().parents[1]
            / "configs"
            / "visualization.yaml"
        )
        viz = load_viz_config(str(path))
        # ref config/visualization.yaml values
        assert viz.vmap["new_obstacles"] == (0.0, 0.8, 0.8, 1.0)
        assert viz.vmap["sure_obstacles"] == (0.0, 0.7, 0.3, 1.0)
        assert viz.vmap["apriori_map"] == (0.0, 0.5, 0.0, 1.0)
        assert viz.vmap["frontiers"] == (1.0, 0.0, 1.0, 0.3)
        assert viz.vmap["candidates"] == (1.0, 0.0, 0.0, 0.8)
        assert viz.vflags["background"] == (0.0, 0.7, 0.3, 1.0)
        assert viz.vflags["unknown"] == (0.1, 0.3, 0.7, 1.0)
        # missing file and no file both give the same shipped defaults
        assert load_viz_config(None).vmap == viz.vmap
        assert load_viz_config("/nonexistent/viz.yaml").vflags == viz.vflags

    def test_vmap_thresholds_binding(self):
        """Colors bind to the live thresholds of the same names
        (ref vofod_nodelet.cpp:1025-1027)."""
        from vofod_tpu.config import DynParams
        from vofod_tpu.runtime.viz import load_viz_config

        dyn = DynParams()
        ths = load_viz_config(None).vmap_thresholds(dyn)
        assert ths[0] == (dyn.thr_new_obstacles, (0.0, 0.8, 0.8, 1.0))
        assert ths[1] == (dyn.thr_sure_obstacles, (0.0, 0.7, 0.3, 1.0))
        assert ths[2] == (dyn.thr_apriori, (0.0, 0.5, 0.0, 1.0))
        # voxel_markers paints by highest exceeded threshold after sorting
        from vofod_tpu.geometry import GridSpec

        g = GridSpec((0, 0, 0), (3, 3, 3), 0.5)
        vals = np.full((3, 3, 3), -740.0, np.float32)
        vals[0, 0, 0] = -200.0  # new_obstacles band
        vals[1, 1, 1] = 1.0  # above apriori
        m = voxel_markers(vals, g, ths)
        cols = {tuple(round(float(x), 3) for x in c) for c in m.colors}
        assert (0.0, 0.8, 0.8, 1.0) in cols and (0.0, 0.5, 0.0, 1.0) in cols

    def test_partial_yaml_overrides(self, tmp_path):
        from vofod_tpu.runtime.viz import load_viz_config

        p = tmp_path / "viz.yaml"
        p.write_text(
            "voxel_map:\n  colors:\n    candidates:\n      r: 0.5\n      g: 0.5\n"
            "      b: 0.5\n      a: 0.5\n"
        )
        viz = load_viz_config(str(p))
        assert viz.vmap["candidates"] == (0.5, 0.5, 0.5, 0.5)
        # untouched entries keep the reference palette
        assert viz.vmap["new_obstacles"] == (0.0, 0.8, 0.8, 1.0)

    def test_partial_color_entry_keeps_other_channels(self, tmp_path):
        """An entry naming only some channels overrides just those — the rest
        keep the shipped palette (not zero)."""
        from vofod_tpu.runtime.viz import load_viz_config

        p = tmp_path / "viz.yaml"
        p.write_text("voxel_map:\n  colors:\n    candidates: {a: 0.5}\n")
        viz = load_viz_config(str(p))
        assert viz.vmap["candidates"] == (1.0, 0.0, 0.0, 0.5)  # ref red kept


class TestViz:
    def test_hsv(self):
        assert hsv_to_rgb(0, 1, 1) == (1, 0, 0)
        r, g, b = hsv_to_rgb(120, 1, 1)
        assert g == 1 and r == 0

    def test_voxel_markers_threshold_colors(self):
        from vofod_tpu.geometry import GridSpec

        g = GridSpec((0, 0, 0), (4, 4, 4), 0.5)
        vals = np.full((4, 4, 4), -740.0, np.float32)
        vals[1, 1, 1] = -100.0  # over new_obstacles
        vals[2, 2, 2] = 10.0  # over apriori
        m = voxel_markers(
            vals, g, [(-300.0, (0, 0, 1, 1)), (0.0, (1, 0, 0, 1))]
        )
        assert len(m.points) == 2
        cols = {tuple(c) for c in m.colors}
        assert (0, 0, 1, 1) in cols and (1, 0, 0, 1) in cols

    def test_cluster_obb_markers(self):
        import types

        from vofod_tpu.runtime.viz import cluster_obb_markers

        det = types.SimpleNamespace(
            cluster_class=np.array([1, 2, 0]),
            valid=np.array([True, False, False]),
            n_points=np.array([5, 3, 0]),
            obb_axes=np.tile(np.eye(3, dtype=np.float32), (3, 1, 1)),
            obb_extent=np.array(
                [[0.5, 0.4, 0.3], [1.0, 1.0, 1.0], [0, 0, 0]], np.float32
            ),
            obb_center=np.array(
                [[1, 2, 3], [4, 5, 6], [0, 0, 0]], np.float32
            ),
        )
        m = cluster_obb_markers(det)
        # two drawable clusters x 12 edges x 2 points
        assert m.points.shape == (2 * 24, 3)
        # mav cluster drawn red, unknown yellow
        assert tuple(m.colors[0]) == (1.0, 0.0, 0.0, 1.0)
        assert tuple(m.colors[24]) == (1.0, 1.0, 0.0, 0.8)
        # first cluster corners centered on (1,2,3) with given extents
        c0 = m.points[:24]
        np.testing.assert_allclose(c0.mean(axis=0), [1, 2, 3], atol=1e-5)
        assert np.max(np.abs(c0 - [1, 2, 3]), axis=0) == pytest.approx(
            [0.5, 0.4, 0.3], abs=1e-5
        )

    def test_border_and_rays(self):
        from vofod_tpu.geometry import GridSpec

        g = GridSpec((0, 0, 0), (4, 4, 4), 0.5)
        b = border_marker(g)
        assert b.points.shape == (24, 3)
        lut = make_lut_simulation(16, 4, np.deg2rad(45.0))
        rm = lidar_ray_markers(lut, np.zeros(64, np.uint32), np.eye(4), stride=8)
        assert rm.points.shape[0] == 2 * (64 // 8)


class TestBagConversion:
    """bag->NPZ converter pure parts (tools/bag_to_npz.py) — the rosbag
    reader itself needs a ROS machine; the conversion math is tested here."""

    def test_organized_cloud_roundtrip_range_field(self):
        from vofod_tpu.tools.bag_to_npz import organized_cloud_to_scan

        H, W = 4, 8
        r = (np.arange(H * W, dtype=np.uint32) * 250).reshape(H, W)
        got = organized_cloud_to_scan({"range": r}, H, W)
        np.testing.assert_array_equal(got, r.reshape(-1))

    def test_organized_cloud_from_xyz(self):
        from vofod_tpu.tools.bag_to_npz import organized_cloud_to_scan

        H, W = 2, 4
        xyz = np.zeros((H * W, 3))
        xyz[:, 0] = np.arange(H * W) * 0.5  # ranges 0, 0.5, 1.0, ... m
        xyz[3] = np.nan  # invalid point -> range 0
        got = organized_cloud_to_scan({"xyz": xyz}, H, W)
        want = (np.arange(H * W) * 500).astype(np.uint32)
        want[3] = 0
        np.testing.assert_array_equal(got, want)

    def test_destagger_applied(self):
        from vofod_tpu.tools.bag_to_npz import organized_cloud_to_scan

        H, W = 2, 4
        shift = np.array([0, 1])
        r = np.arange(H * W, dtype=np.uint32).reshape(H, W)
        got = organized_cloud_to_scan(
            {"range": r}, H, W, pixel_shift_by_row=shift, do_destagger=True
        ).reshape(H, W)
        np.testing.assert_array_equal(got[0], r[0])  # shift 0
        np.testing.assert_array_equal(got[1], r[1][[1, 2, 3, 0]])  # shift 1

    def test_tf_chain_composition_and_latest_lookup(self):
        from vofod_tpu.tools.bag_to_npz import accumulate_tf

        msgs = [
            # world -> uav at two stamps (moves +1m in x)
            dict(stamp=0.0, parent="world", child="uav",
                 txyz=(1.0, 0.0, 2.0), quat=(0, 0, 0, 1)),
            dict(stamp=1.0, parent="world", child="uav",
                 txyz=(2.0, 0.0, 2.0), quat=(0, 0, 0, 1)),
            # static uav -> os_sensor: +0.1m z, yaw 90deg
            dict(stamp=0.0, parent="uav", child="os_sensor",
                 txyz=(0.0, 0.0, 0.1),
                 quat=(0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4))),
        ]
        chain = accumulate_tf(msgs, "world", "os_sensor")
        T0 = chain.lookup(0.5)
        np.testing.assert_allclose(T0[:3, 3], [1.0, 0.0, 2.1], atol=1e-6)
        # yaw 90: sensor x-axis maps to world y-axis
        np.testing.assert_allclose(T0[:3, :3] @ [1, 0, 0], [0, 1, 0],
                                   atol=1e-6)
        T1 = chain.lookup(5.0)  # latest transform
        np.testing.assert_allclose(T1[:3, 3], [2.0, 0.0, 2.1], atol=1e-6)

    def test_tf_chain_missing_edge_raises(self):
        from vofod_tpu.tools.bag_to_npz import accumulate_tf

        with np.testing.assert_raises(ValueError):
            accumulate_tf([], "world", "os_sensor")


class TestRosAdapterConverters:
    def test_quat_to_matrix_identity_and_yaw(self):
        from vofod_tpu.runtime.ros_adapter import quat_to_matrix

        np.testing.assert_allclose(quat_to_matrix(0, 0, 0, 1), np.eye(3),
                                   atol=1e-9)
        R = quat_to_matrix(0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4))
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-9)

    def test_detections_and_status_json(self):
        import json

        from vofod_tpu.io.msgs import Detection, Detections, Header, Status
        from vofod_tpu.runtime.ros_adapter import (
            detections_to_json,
            status_to_json,
        )

        out = Detections(header=Header(1.5, "world"))
        out.detections.append(
            Detection(id=3, confidence=0.9, n_points=12,
                      position=(1.0, 2.0, 3.0), covariance=(0.0,) * 9,
                      detection_probability=0.8)
        )
        d = json.loads(detections_to_json(out))
        assert d["frame_id"] == "world"
        assert d["detections"][0]["id"] == 3
        s = json.loads(status_to_json(
            Status(detection_enabled=True, detection_active=False), 2.0))
        assert s == {"stamp": 2.0, "detection_enabled": True,
                     "detection_active": False}
