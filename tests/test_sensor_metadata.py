"""Ouster metadata parsing, is_floating, NPZ scan replay."""

import json

import jax.numpy as jnp
import numpy as np

from vofod_tpu.ops.morphology import is_floating
from vofod_tpu.sensor import parse_ouster_metadata


def _metadata(H=16, W=64, nested=True):
    alt = list(np.linspace(22.5, -22.5, H))
    az = list(np.linspace(-1.5, 1.5, H))
    beam = {
        "beam_altitude_angles": alt,
        "beam_azimuth_angles": az,
        "lidar_origin_to_beam_origin_mm": 15.806,
    }
    fmt = {
        "pixels_per_column": H,
        "columns_per_frame": W,
        "pixel_shift_by_row": list(range(H)),
    }
    intr = {
        "lidar_to_sensor_transform": [
            -1, 0, 0, 0, 0, -1, 0, 0, 0, 0, 1, 36.18, 0, 0, 0, 1
        ]
    }
    if nested:
        return json.dumps(
            {"beam_intrinsics": beam, "lidar_data_format": fmt,
             "lidar_intrinsics": intr}
        )
    d = dict(beam)
    d.update(fmt)
    d.update(intr)
    return json.dumps(d)


class TestOusterMetadata:
    def test_nested_and_flat_formats(self):
        for nested in (True, False):
            cfg, lut, shift = parse_ouster_metadata(_metadata(nested=nested))
            assert cfg.vertical_rays == 16 and cfg.horizontal_rays == 64
            assert abs(np.degrees(cfg.vertical_fov) - 45.0) < 1e-6
            assert lut.directions.shape == (16 * 64, 3)
            np.testing.assert_allclose(
                np.linalg.norm(lut.directions, axis=1), 1.0, atol=1e-5
            )
            np.testing.assert_array_equal(shift, np.arange(16))

    def test_lut_reconstructs_points(self):
        cfg, lut, _ = parse_ouster_metadata(_metadata())
        # a point at range r must reconstruct as dir*r + offset; verify the
        # lidar_to_sensor transform moved the offsets (z += 36.18 mm)
        assert abs(float(np.mean(lut.offsets[:, 2])) - 0.03618) < 0.02


class TestIsFloating:
    def test_matches_reference_semantics(self):
        vals = np.full((6, 6, 6), -1000.0, np.float32)
        vals[3, 3, 3] = -100.0  # one obstacle
        out = np.asarray(is_floating(jnp.asarray(vals), jnp.float32(-750.0)))
        # voxels adjacent (26-n) to the obstacle are not floating
        assert not out[3, 3, 3] and not out[2, 2, 2] and not out[4, 4, 4]
        # a voxel two away is floating
        assert out[3, 3, 1]
        # border voxels never float (ref voxel_map.cpp:493-496)
        assert not out[0, 3, 3] and not out[3, 0, 3] and not out[5, 5, 5]


class TestReplay:
    def test_npz_replay(self, tmp_path):
        from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
        from vofod_tpu.io.scan_source import (
            Scene, hover_pose, render_scan, save_scans_npz,
        )
        from vofod_tpu.runtime.node import NodeOptions, VoFOD

        cfg = VoFODConfig(
            sensor=SensorConfig(vertical_rays=8, horizontal_rays=32),
            oparea=Box((0, 0, 4), (10.0, 10.0, 10.0)),
            max_clusters=4, max_far_voxels=128, max_queries=32,
            explore_submap=8, confidence_submap=8,
        )
        node = VoFOD(cfg, DynParams(), NodeOptions(raycast_mode="off"))
        pose = hover_pose((0.0, 0.0, 3.0))
        r = render_scan(Scene(ground_z=0.0), node.lut, pose)
        p = str(tmp_path / "scans.npz")
        save_scans_npz(p, np.stack([r, r, r]), np.stack([pose] * 3))
        msgs = node.replay(p)
        assert len(msgs) == 3
        assert int(node.state.step) == 3
        assert msgs[2].header.stamp == 0.2
