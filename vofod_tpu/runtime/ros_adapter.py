"""Optional ROS 1 adapter: maps the framework onto the reference's topics.

The reference is a ROS Noetic nodelet (nodelets.xml, launch/detect.launch);
this adapter reproduces its wire interface on top of the TPU pipeline when
``rospy`` is importable (it is not part of the baked test environment — the
adapter is import-safe and unit-tested only for message conversion).

Topic mapping (ref launch/detect.launch:58-88):
  in : ~pointcloud (sensor_msgs/PointCloud2, organized HxW with range field)
  in : ~rangefinder (sensor_msgs/Range)
  out: ~detections (vofod/Detections-compatible: here mrs-free JSON-ish or
       PoseWithCovarianceArray when mrs_msgs is absent)
  out: ~status, ~profiling_info, debug markers
  srv: ~reset
"""

from __future__ import annotations

import numpy as np

from vofod_tpu.runtime.node import VoFOD


def ros_available() -> bool:
    try:
        import rospy  # noqa: F401

        return True
    except ImportError:
        return False


def pointcloud2_to_ranges(msg_fields: dict, height: int, width: int) -> np.ndarray:
    """Convert an organized cloud dict {'range': [H*W] mm or 'xyz': [H*W,3]}
    to the ranges_mm vector the pipeline consumes.  Pure function so it can
    be tested without ROS."""
    if "range" in msg_fields:
        return np.asarray(msg_fields["range"], np.uint32).reshape(-1)
    xyz = np.asarray(msg_fields["xyz"], np.float64).reshape(-1, 3)
    r = np.linalg.norm(xyz, axis=1)
    r[~np.isfinite(r)] = 0.0
    return np.round(r * 1000.0).astype(np.uint32)


class RosNode:
    """rospy wrapper; constructed only when ROS is present."""

    def __init__(self, detector: VoFOD, tf_frame: str = "world"):
        if not ros_available():
            raise RuntimeError(
                "rospy not available — use vofod_tpu.runtime.node.VoFOD directly"
            )
        import rospy
        from sensor_msgs.msg import PointCloud2, Range
        from std_srvs.srv import Trigger, TriggerResponse

        self.det = detector
        self.tf_frame = tf_frame
        rospy.Subscriber("~pointcloud", PointCloud2, self._pc_cb, queue_size=2)
        rospy.Subscriber("~rangefinder", Range, self._rf_cb, queue_size=2)
        self._srv = rospy.Service("~reset", Trigger, self._reset_cb)
        self._pub = rospy.Publisher("~detections_json", __import__("std_msgs.msg", fromlist=["String"]).String, queue_size=2)

    def _reset_cb(self, _req):
        from std_srvs.srv import TriggerResponse

        self.det.reset()
        return TriggerResponse(success=True, message="Detector reset.")

    def _pc_cb(self, msg):
        import json

        import rospy
        import sensor_msgs.point_cloud2 as pc2

        H, W = msg.height, msg.width
        fields = [f.name for f in msg.fields]
        if "range" in fields:
            arr = np.array(
                list(pc2.read_points(msg, field_names=("range",))), np.uint32
            ).reshape(-1)
            ranges = arr
        else:
            xyz = np.array(
                list(pc2.read_points(msg, field_names=("x", "y", "z"))), np.float64
            )
            ranges = pointcloud2_to_ranges({"xyz": xyz}, H, W)
        pose = self._lookup_pose(msg.header)
        if pose is None:
            return
        out = self.det.process_scan(ranges, None, pose, msg.header.stamp.to_sec())
        self._pub.publish(json.dumps({
            "stamp": out.header.stamp,
            "detections": [vars(d) for d in out.detections],
        }, default=str))

    def _rf_cb(self, msg):
        pose = self._lookup_pose(msg.header)
        if pose is not None:
            self.det.process_rangefinder(msg.range, msg.min_range, msg.max_range, pose)

    def _lookup_pose(self, header):
        try:
            import tf2_ros

            if not hasattr(self, "_tf_buf"):
                self._tf_buf = tf2_ros.Buffer()
                self._tf_listener = tf2_ros.TransformListener(self._tf_buf)
            t = self._tf_buf.lookup_transform(
                self.tf_frame, header.frame_id.lstrip("/"), header.stamp
            )
            q = t.transform.rotation
            x, y, z, w = q.x, q.y, q.z, q.w
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ])
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = (
                t.transform.translation.x,
                t.transform.translation.y,
                t.transform.translation.z,
            )
            return T
        except Exception:
            return None
