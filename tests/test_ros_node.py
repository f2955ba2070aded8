"""RosNode (runtime/ros_adapter.py) against a stubbed rospy.

The live-ROS side of the adapter cannot run here (no rospy in the
environment), so these tests inject minimal fake ``rospy`` / message modules
and drive the node class through its callbacks — catching API drift against
the reference's wire surface (vofod_nodelet.cpp:241-278,
launch/detect.launch:58-88) without a ROS install.
"""

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.runtime.node import VoFOD
from vofod_tpu.sensor import make_lut

H, W = 16, 64


class _Pub:
    def __init__(self, topic):
        self.topic = topic
        self.published = []
        self.connections = 1

    def publish(self, msg):
        self.published.append(msg)

    def get_num_connections(self):
        return self.connections


class _FakeTime:
    def __init__(self, t):
        self._t = t

    def to_sec(self):
        return self._t

    @staticmethod
    def now():
        return _FakeTime(123.0)


@pytest.fixture()
def ros_stub(monkeypatch):
    """Install fake rospy + message modules; return the recording registry."""
    reg = SimpleNamespace(subs={}, pubs={}, srvs={}, timers=[], warnings=[])

    rospy = types.ModuleType("rospy")
    rospy.Subscriber = lambda topic, typ, cb, queue_size=1: reg.subs.__setitem__(
        topic, cb
    )
    rospy.Service = lambda name, typ, cb: reg.srvs.__setitem__(name, cb)

    def _pub(topic, typ, queue_size=1):
        p = _Pub(topic)
        reg.pubs[topic] = p
        return p

    rospy.Publisher = _pub
    rospy.Timer = lambda dur, cb: reg.timers.append((dur, cb))
    rospy.Duration = lambda s: s
    rospy.Time = _FakeTime
    rospy.get_time = lambda: 123.0
    rospy.logwarn_throttle = lambda period, msg: reg.warnings.append(msg)

    std_msgs = types.ModuleType("std_msgs")
    std_msgs_msg = types.ModuleType("std_msgs.msg")

    class String:
        def __init__(self, data=""):
            self.data = data

    class Header:
        def __init__(self):
            self.stamp = _FakeTime(0.0)
            self.frame_id = ""

    std_msgs_msg.String = String
    std_msgs_msg.Header = Header

    std_srvs = types.ModuleType("std_srvs")
    std_srvs_srv = types.ModuleType("std_srvs.srv")
    std_srvs_srv.Trigger = object

    class TriggerResponse:
        def __init__(self, success=False, message=""):
            self.success, self.message = success, message

    std_srvs_srv.TriggerResponse = TriggerResponse

    sensor_msgs = types.ModuleType("sensor_msgs")
    sensor_msgs_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msgs_msg.PointCloud2 = object
    sensor_msgs_msg.Range = object

    class Image:
        def __init__(self):
            self.header = Header()
            self.height = self.width = 0
            self.encoding = ""
            self.is_bigendian = 0
            self.step = 0
            self.data = b""

    sensor_msgs_msg.Image = Image
    pc2 = types.ModuleType("sensor_msgs.point_cloud2")

    def read_points(msg, field_names):
        cols = [msg._columns[n] for n in field_names]
        return list(zip(*cols)) if len(cols) > 1 else [(v,) for v in cols[0]]

    pc2.read_points = read_points
    pc2.create_cloud_xyz32 = lambda header, pts: SimpleNamespace(
        header=header, points=pts
    )

    viz = types.ModuleType("visualization_msgs")
    viz_msg = types.ModuleType("visualization_msgs.msg")

    class Marker:
        SPHERE = 2
        ADD = 0

        def __init__(self):
            self.header = Header()
            self.pose = SimpleNamespace(
                position=SimpleNamespace(x=0, y=0, z=0),
                orientation=SimpleNamespace(x=0, y=0, z=0, w=0),
            )
            self.scale = SimpleNamespace(x=0, y=0, z=0)
            self.color = SimpleNamespace(r=0, g=0, b=0, a=0)

    class MarkerArray:
        def __init__(self):
            self.markers = []

    viz_msg.Marker = Marker
    viz_msg.MarkerArray = MarkerArray

    tf2_ros = types.ModuleType("tf2_ros")

    class Buffer:
        def lookup_transform(self, target, source, stamp):
            # world_T_sensor = the hover pose the test scans were rendered at
            return SimpleNamespace(
                transform=SimpleNamespace(
                    translation=SimpleNamespace(x=0.0, y=0.0, z=7.0),
                    rotation=SimpleNamespace(x=0.0, y=0.0, z=0.0, w=1.0),
                )
            )

    tf2_ros.Buffer = Buffer
    tf2_ros.TransformListener = lambda buf: None

    mods = {
        "rospy": rospy,
        "std_msgs": std_msgs,
        "std_msgs.msg": std_msgs_msg,
        "std_srvs": std_srvs,
        "std_srvs.srv": std_srvs_srv,
        "sensor_msgs": sensor_msgs,
        "sensor_msgs.msg": sensor_msgs_msg,
        "sensor_msgs.point_cloud2": pc2,
        "visualization_msgs": viz,
        "visualization_msgs.msg": viz_msg,
        "tf2_ros": tf2_ros,
    }
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    reg.String = String
    return reg


def _node():
    cfg = VoFODConfig(
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
    det = VoFOD(cfg, DynParams(raycast_weight_coefficient=0.5))
    xs = np.arange(-7.5, 8.0, 0.5)
    gx, gy = np.meshgrid(xs, xs)
    det.load_apriori_map(
        np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 0.5)], axis=1)
    )
    return det


def _pc_msg(ranges, stamp=5.0):
    return SimpleNamespace(
        height=H,
        width=W,
        fields=[SimpleNamespace(name="range")],
        header=SimpleNamespace(stamp=_FakeTime(stamp), frame_id="os_sensor"),
        _columns={"range": ranges.astype(np.uint32).tolist()},
    )


class TestRosNode:
    def test_wire_surface(self, ros_stub):
        from vofod_tpu.runtime.ros_adapter import RosNode

        node = RosNode(_node())
        # subscriber names match the reference's (vofod_nodelet.cpp:247-248)
        assert set(ros_stub.subs) == {"~pointcloud", "~height_rangefinder"}
        assert set(ros_stub.srvs) == {"~reset"}
        for topic in (
            "~detections_json", "~status_json", "~profiling_info_json",
            "~detections_mks", "~background_pc", "~sure_air_pc",
        ):
            assert topic in ros_stub.pubs, topic
        assert ros_stub.timers, "10 Hz status timer missing"
        assert node is not None

    def test_remap_and_rosbag_suffix(self, ros_stub):
        """<remap> lines + the rosbag_remap suffix (detect.launch:8-10,58-88):
        subscriptions remap only; every output topic gets the suffix; the
        reset service is never suffixed."""
        from vofod_tpu.runtime.ros_adapter import RosNode

        RosNode(
            _node(),
            remap={
                "~pointcloud": "/uav1/os_cloud_nodelet/points",
                "~height_rangefinder": "/uav1/garmin/range",
            },
            topic_suffix="_",
        )
        assert set(ros_stub.subs) == {
            "/uav1/os_cloud_nodelet/points", "/uav1/garmin/range"
        }
        assert set(ros_stub.srvs) == {"~reset"}
        for topic in (
            "~detections_json_", "~status_json_", "~profiling_info_json_",
            "~detections_mks_", "~background_pc_", "~sure_air_pc_",
        ):
            assert topic in ros_stub.pubs, topic

    def test_scan_callback_passes_intensity(self, ros_stub, monkeypatch):
        """The raycast intensity gate rides the cloud message
        (ref vofod_nodelet.cpp:1449); 'signal' is the newer driver name."""
        from vofod_tpu.runtime.ros_adapter import RosNode

        node = RosNode(_node())
        seen = []
        monkeypatch.setattr(
            VoFOD, "process_scan",
            lambda self, r, inten, pose, stamp, **kw: seen.append(inten)
            or SimpleNamespace(detections=[],
                               header=SimpleNamespace(stamp=stamp,
                                                      frame_id="world")),
        )
        cb = ros_stub.subs["~pointcloud"]
        r = np.full(H * W, 5000, np.uint32)
        msg = _pc_msg(r)
        msg.fields.append(SimpleNamespace(name="signal"))
        msg._columns["signal"] = (np.arange(H * W) % 11).astype(float).tolist()
        cb(msg)
        assert seen and seen[0] is not None
        np.testing.assert_allclose(seen[0], np.arange(H * W) % 11)
        cb(_pc_msg(r))  # no intensity field -> None (all-pass default)
        assert seen[1] is None
        assert node is not None

    def test_scan_callback_publishes_detection(self, ros_stub):
        import json

        from vofod_tpu.runtime.ros_adapter import RosNode

        RosNode(_node())
        cb = ros_stub.subs["~pointcloud"]
        lut = make_lut(
            SensorConfig(
                vertical_rays=H, horizontal_rays=W,
                vertical_fov=np.deg2rad(90.0),
            )
        )
        pose = hover_pose((0.0, 0.0, 7.0))
        ground = Scene(ground_z=0.5)
        target = Scene(ground_z=0.5)
        target.add_sphere(center=(4.0, 0.0, 9.0), radius=0.7)
        for k in range(6):
            cb(_pc_msg(render_scan(ground, lut, pose), stamp=float(k)))
        for k in range(3):
            cb(_pc_msg(render_scan(target, lut, pose), stamp=6.0 + k))

        published = ros_stub.pubs["~detections_json"].published
        assert len(published) == 9  # one Detections message per scan
        last = json.loads(published[-1].data)
        assert len(last["detections"]) == 1
        assert abs(float(last["detections"][0]["position"][2]) - 9.0) < 1.0
        # detection markers went out too (subscriber count stubbed > 0)
        assert ros_stub.pubs["~detections_mks"].published[-1].markers

    def test_status_timer_and_reset(self, ros_stub):
        import json

        from vofod_tpu.runtime.ros_adapter import RosNode

        node = RosNode(_node())
        _, status_cb = ros_stub.timers[0], ros_stub.timers[0][1]
        status_cb(None)
        st = json.loads(ros_stub.pubs["~status_json"].published[-1].data)
        assert st["detection_enabled"] is True
        # debug clouds published when subscribed
        assert ros_stub.pubs["~background_pc"].published
        assert ros_stub.pubs["~sure_air_pc"].published

        resp = ros_stub.srvs["~reset"](None)
        assert resp.success
        assert int(np.asarray(node.det.state.step)) == 0

    def test_tf_failure_drops_scan_loudly(self, ros_stub, monkeypatch):
        from vofod_tpu.runtime.ros_adapter import RosNode

        node = RosNode(_node())
        import tf2_ros

        def boom(self, *a):
            raise RuntimeError("no tf")

        monkeypatch.setattr(tf2_ros.Buffer, "lookup_transform", boom)
        cb = ros_stub.subs["~pointcloud"]
        cb(_pc_msg(np.zeros(H * W, np.uint32)))
        assert node.tf_failures == 1
        assert ros_stub.warnings  # logged loudly (ref :913-923)
        assert not ros_stub.pubs["~detections_json"].published


class TestRosMaskCreator:
    """The MaskCreator nodelet's wire surface (ref src/mask_creator.cpp:
    63-76 names, 164-189 display loop, 193-260 services + accumulation)."""

    def _mc(self):
        from vofod_tpu.runtime.mask_creator import MaskCreator

        return MaskCreator(H, W)

    def test_wire_surface(self, ros_stub):
        from vofod_tpu.runtime.ros_adapter import RosMaskCreator

        RosMaskCreator(self._mc())
        assert set(ros_stub.subs) == {"~pointcloud"}
        # the second nodelet's services: save AND reset (:75-76)
        assert set(ros_stub.srvs) == {"~save", "~reset"}
        assert "~mask" in ros_stub.pubs
        # 20 Hz display loop (ref sleeps 0.05 s, :188)
        assert ros_stub.timers and ros_stub.timers[-1][0] == pytest.approx(0.05)

    def test_accumulate_and_publish_mono8(self, ros_stub):
        from vofod_tpu.runtime.ros_adapter import RosMaskCreator

        node = RosMaskCreator(self._mc())
        cb = ros_stub.subs["~pointcloud"]
        r = np.full(H * W, 5000, np.uint32)
        dead = np.arange(0, H * W, 7)
        r[dead] = 0  # pixels that EVER return 0 go occluded (:225-233)
        cb(_pc_msg(r))
        r2 = np.full(H * W, 5000, np.uint32)  # later scans don't resurrect
        cb(_pc_msg(r2))
        ros_stub.timers[-1][1](None)
        img = ros_stub.pubs["~mask"].published[-1]
        assert (img.height, img.width) == (H, W)
        assert img.encoding == "mono8" and img.step == W
        m = np.frombuffer(img.data, np.uint8).reshape(H, W).reshape(-1)
        assert (m[dead] == 0).all()
        keep = np.setdiff1d(np.arange(H * W), dead)
        assert (m[keep] == 255).all()

    def test_save_and_reset_services(self, ros_stub, tmp_path):
        from vofod_tpu.runtime.ros_adapter import RosMaskCreator

        path = str(tmp_path / "mask.npy")
        node = RosMaskCreator(self._mc(), mask_fname=path)
        cb = ros_stub.subs["~pointcloud"]
        r = np.full(H * W, 5000, np.uint32)
        r[:10] = 0
        cb(_pc_msg(r))
        resp = ros_stub.srvs["~save"](None)
        assert resp.success and "saved" in resp.message.lower()
        saved = np.load(path).reshape(-1)
        assert (saved[:10] == 0).all() and saved[10:].all()
        resp = ros_stub.srvs["~reset"](None)
        assert resp.success and "reset" in resp.message.lower()
        assert node.mc.mask().all() and node.mc.n_scans == 0

    def test_remap_and_suffix(self, ros_stub):
        """Same remap/rosbag-suffix semantics as the detector adapter:
        subscriptions/services remap only; the mask image is an output."""
        from vofod_tpu.runtime.ros_adapter import RosMaskCreator

        RosMaskCreator(
            self._mc(),
            remap={"~pointcloud": "/uav1/os_cloud_nodelet/points"},
            topic_suffix="_",
        )
        assert set(ros_stub.subs) == {"/uav1/os_cloud_nodelet/points"}
        assert "~mask_" in ros_stub.pubs
        assert set(ros_stub.srvs) == {"~save", "~reset"}
