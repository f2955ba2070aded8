"""Real-data on-ramp: rosbag-format fixture -> bag_to_npz -> VoFOD.replay.

The reference is validated on recorded Ouster bags (launch/detect.launch:8-10,
rosbag_remap).  These tests author a rosbag v2.0 fixture with synthetic
STAGGERED Ouster frames carrying the raw ``range`` channel (the field the
reference consumes, vofod_nodelet.cpp:1455) plus a world->uav->sensor TF
chain, run the converter end-to-end through the pure-Python bag reader
(io/rosbag_lite.py — the no-ROS ingestion path), and replay the NPZ through
the detector, asserting the flying target is found.
"""

import json
import os

import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io import rosbag_lite as rb
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.runtime.node import NodeOptions, VoFOD
from vofod_tpu.sensor import destagger, make_lut
from vofod_tpu.tools import bag_to_npz

H, W = 16, 64


def small_cfg():
    return VoFODConfig(
        sensor=SensorConfig(
            vertical_rays=H, horizontal_rays=W, vertical_fov=np.deg2rad(90.0)
        ),
        oparea=Box((0.0, 0.0, 5.75), (16.0, 16.0, 11.5)),
        background_sufficient_points_ratio=0.05,
        max_clusters=8,
        max_far_voxels=512,
        max_queries=64,
        explore_submap=16,
        confidence_submap=8,
    )


def stagger(img: np.ndarray, shift: np.ndarray) -> np.ndarray:
    """Inverse of sensor.destagger: destagger(stagger(x)) == x."""
    cols = (np.arange(W)[None, :] - shift[:, None]) % W
    return np.take_along_axis(img, cols, axis=1)


@pytest.fixture(scope="module")
def fixture_bag(tmp_path_factory):
    """Write the rosbag + Ouster metadata fixture; return paths and the
    ground-truth (ranges, poses)."""
    tmp = tmp_path_factory.mktemp("bag")
    cfg = small_cfg()
    lut = make_lut(cfg.sensor)
    rng = np.random.default_rng(7)
    shift = rng.integers(0, W, H).astype(np.int64)

    meta = {
        "beam_intrinsics": {
            "beam_altitude_angles": list(np.linspace(45.0, -45.0, H)),
            "beam_azimuth_angles": [0.0] * H,
            "lidar_origin_to_beam_origin_mm": 15.0,
        },
        "lidar_data_format": {
            "pixels_per_column": H,
            "columns_per_frame": W,
            "pixel_shift_by_row": [int(s) for s in shift],
        },
    }
    meta_path = os.path.join(tmp, "metadata.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    # scenario: ground + a floating sphere appearing from scan 8
    ranges_true, poses_true, stamps = [], [], []
    bag_path = os.path.join(tmp, "fixture.bag")
    uav_T_sensor = dict(
        stamp=0.0, parent="uav", child="os_sensor",
        txyz=(0.1, 0.0, -0.05), quat=(0.0, 0.0, 0.0, 1.0),
    )
    with rb.BagWriter(bag_path) as w:
        w.write_tf("/tf_static", 0.0, [uav_T_sensor])
        from vofod_tpu.runtime.ros_adapter import transform_to_pose

        T_us = transform_to_pose(*uav_T_sensor["txyz"], *uav_T_sensor["quat"])
        for k in range(20):
            t = 100.0 + 0.1 * k
            th = 0.2 * k
            scene = Scene(ground_z=0.5)
            if k >= 8:
                scene.add_sphere(
                    center=(4.0, 0.4 * np.sin(th), 9.0), radius=0.7
                )
            # world_T_uav: the UAV flies an arc with yaw
            c, s = np.cos(0.1 * k), np.sin(0.1 * k)
            quat = (0.0, 0.0, np.sin(0.05 * k), np.cos(0.05 * k))
            txyz = (np.cos(th), np.sin(th), 7.0)
            T_wu = transform_to_pose(*txyz, *quat)
            pose = (T_wu @ T_us).astype(np.float32)
            r = render_scan(scene, lut, pose).reshape(H, W)
            ranges_true.append(r.reshape(-1))
            poses_true.append(pose)
            stamps.append(t)
            w.write_tf(
                "/tf", t,
                [dict(stamp=t, parent="world", child="uav",
                      txyz=txyz, quat=quat)],
            )
            staggered = stagger(r.astype(np.uint32), shift)
            # intensity channel rides along (ref gates raycast pixels on it,
            # vofod_nodelet.cpp:1449) — deterministic per-pixel pattern,
            # staggered exactly like the ranges
            inten = (
                100.0 + (np.arange(H * W, dtype=np.float32) % 7.0) + 0.5 * k
            ).reshape(H, W)
            inten_st = stagger(inten, shift)
            interleaved = np.zeros((H * W, 8), np.uint8)
            interleaved[:, :4] = (
                staggered.astype("<u4").reshape(-1, 1).view(np.uint8)
            )
            interleaved[:, 4:] = (
                inten_st.astype("<f4").reshape(-1, 1).view(np.uint8)
            )
            w.write_pointcloud2(
                "/os_cloud_node/points", t,
                frame_id="os_sensor", height=H, width=W,
                fields=[("range", 0, 6, 1), ("intensity", 4, 7, 1)],
                point_step=8,
                data=interleaved.tobytes(),
            )
    return bag_path, meta_path, np.stack(ranges_true), np.stack(poses_true)


class TestRosbagLite:
    def test_roundtrip(self, tmp_path):
        path = os.path.join(tmp_path, "rt.bag")
        data = np.arange(H * W, dtype="<u4")
        with rb.BagWriter(path) as w:
            w.write_tf(
                "/tf", 1.5,
                [dict(stamp=1.5, parent="world", child="s",
                      txyz=(1.0, 2.0, 3.0), quat=(0.0, 0.0, 0.0, 1.0))],
            )
            w.write_pointcloud2(
                "/pc", 2.0, frame_id="s", height=H, width=W,
                fields=[("range", 0, 6, 1)], point_step=4,
                data=data.tobytes(),
            )
        msgs = list(rb.read_bag(path))
        assert [m.msg_type for m in msgs] == [rb.TF_TYPE, rb.PC2_TYPE]
        tf = msgs[0].msg[0]
        assert tf["parent"] == "world" and tf["child"] == "s"
        np.testing.assert_allclose(tf["txyz"], (1.0, 2.0, 3.0))
        pc = msgs[1].msg
        assert (pc.height, pc.width, pc.frame_id) == (H, W, "s")
        np.testing.assert_array_equal(pc.extract(("range",))["range"], data)
        # the bag header is a valid padded 4096-byte record with index_pos
        with open(path, "rb") as f:
            assert f.read(len(rb.MAGIC)) == rb.MAGIC

    def test_bz2_chunk_roundtrip(self, tmp_path):
        """`rosbag record --bz2` analogue: a bz2-compressed chunk reads
        back identically (reader decompresses transparently)."""
        path = os.path.join(tmp_path, "rt_bz2.bag")
        data = np.arange(H * W, dtype="<u4")
        with rb.BagWriter(path, compression="bz2") as w:
            w.write_pointcloud2(
                "/pc", 2.0, frame_id="s", height=H, width=W,
                fields=[("range", 0, 6, 1)], point_step=4,
                data=data.tobytes(),
            )
        (m,) = list(rb.read_bag(path))
        np.testing.assert_array_equal(m.msg.extract(("range",))["range"], data)
        # the chunk record on disk is actually bz2 (BZh magic in payload)
        with open(path, "rb") as f:
            assert b"BZh" in f.read()

    def test_unknown_compression_raises(self, tmp_path):
        with pytest.raises(ValueError):
            rb.BagWriter(os.path.join(tmp_path, "x.bag"), compression="zstd")

    def test_topic_filter(self, fixture_bag):
        bag_path = fixture_bag[0]
        msgs = list(rb.read_bag(bag_path, topics=["/tf"]))
        assert msgs and all(m.topic == "/tf" for m in msgs)


class TestBagToNpz:
    def test_convert_and_replay(self, fixture_bag, tmp_path):
        """bag -> npz (destaggered via metadata, TF chain composed) ->
        detector replay finds the flying target."""
        bag_path, meta_path, ranges_true, poses_true = fixture_bag
        out = os.path.join(tmp_path, "scans.npz")
        bag_to_npz.main(
            [
                bag_path, out,
                "--pointcloud-topic", "/os_cloud_node/points",
                "--world-frame", "world",
                "--destagger", "--metadata", meta_path,
            ]
        )
        z = np.load(out)
        np.testing.assert_array_equal(z["ranges"], ranges_true)
        np.testing.assert_allclose(z["poses"], poses_true, atol=1e-6)
        # intensity extracted and destaggered alongside the ranges
        assert "intensity" in z.files and z["intensity"].shape == z["ranges"].shape
        want0 = (100.0 + (np.arange(H * W, dtype=np.float32) % 7.0))
        np.testing.assert_allclose(z["intensity"][0], want0)
        np.testing.assert_allclose(z["intensity"][5], want0 + 0.5 * 5)

        cfg = small_cfg()
        node = VoFOD(
            cfg,
            DynParams(raycast_weight_coefficient=0.5),
            NodeOptions(raycast_mode="sweep"),
        )
        xs = np.arange(-7.5, 8.0, 0.5)
        gx, gy = np.meshgrid(xs, xs)
        node.load_apriori_map(
            np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 0.5)], axis=1)
        )
        msgs = node.replay(out)
        det_scans = [i for i, m in enumerate(msgs) if m.detections]
        assert det_scans and det_scans[0] >= 8
        pos = np.array(msgs[det_scans[-1]].detections[0].position)
        assert abs(pos[2] - 9.0) < 1.0  # the floating sphere's altitude


class TestDetectCliOnBag:
    def test_detect_cli_bag_input(self, fixture_bag, tmp_path, capsys):
        """`tools.detect --scans fixture.bag` — the `rosbag play` analogue:
        the CLI converts the bag in place (io/rosbag_lite path) and replays
        it; the flying target must surface in the JSON output.  The YAMLs +
        --small-capacities reproduce small_cfg exactly, so the step cache
        reuses the compile from the replay test above."""
        import json as _json

        from vofod_tpu.tools.detect import main

        bag_path, meta_path, _, _ = fixture_bag
        dety = str(tmp_path / "det.yaml")
        with open(dety, "w") as f:
            f.write(
                "background_sufficient_points_ratio: 0.05\n"
                "raycast: {weight_coefficient: 0.5}\n"
            )
        seny = str(tmp_path / "sen.yaml")
        with open(seny, "w") as f:
            f.write(
                "sensor: {vertical_fov_angle: 90.0, vertical_rays: 16, "
                "horizontal_rays: 64}\n"
            )
        mapy = str(tmp_path / "map.yaml")
        with open(mapy, "w") as f:
            f.write(
                "operation_area:\n"
                # ref convention: YAML z offset is the box BOTTOM; the loader
                # adds size_z/2, giving small_cfg's center z = 5.75
                "  offset: {x: 0.0, y: 0.0, z: 0.0}\n"
                "  size: {x: 16.0, y: 16.0, z: 11.5}\n"
            )
        cloud = str(tmp_path / "ground.pts")
        xs = np.arange(-7.5, 8.0, 0.5)
        gx, gy = np.meshgrid(xs, xs)
        from vofod_tpu.io.pc_loader import save_cloud

        save_cloud(
            cloud,
            np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 0.5)], axis=1),
        )
        rc = main(
            [
                "--scans", bag_path,
                "--pointcloud-topic", "/os_cloud_node/points",
                "--metadata", meta_path,
                "--config", dety, "--sensor", seny, "--map", mapy,
                "--apriori-cloud", cloud,
                "--small-capacities", "--json",
            ]
        )
        assert rc == 0
        out = [
            _json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()
        ]
        assert len(out) == 20  # one line per bag scan
        det_scans = [i for i, m in enumerate(out) if m["detections"]]
        assert det_scans and det_scans[0] >= 8
        pos = out[det_scans[-1]]["detections"][0]["position"]
        assert abs(pos[2] - 9.0) < 1.0
