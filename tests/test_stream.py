"""Streaming runtime: producer thread -> ring -> detector loop."""

import threading
import time

import numpy as np
import pytest

from vofod_tpu.config import Box, DynParams, SensorConfig, VoFODConfig
from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
from vofod_tpu.runtime.node import NodeOptions, VoFOD
from vofod_tpu.runtime.stream import StreamRunner


@pytest.mark.parametrize("depth", [0, 1, 3])
def test_stream_processes_and_drops(depth):
    cfg = VoFODConfig(
        sensor=SensorConfig(vertical_rays=8, horizontal_rays=32),
        oparea=Box((0, 0, 4), (10.0, 10.0, 10.0)),
        max_clusters=4, max_far_voxels=128, max_queries=32,
        explore_submap=8, confidence_submap=8,
    )
    node = VoFOD(cfg, DynParams(), NodeOptions(raycast_mode="off"))
    pose = hover_pose((0.0, 0.0, 3.0))
    ranges = render_scan(Scene(ground_z=0.0), node.lut, pose)
    node.process_scan(ranges, None, pose)  # compile before streaming

    got = []
    statuses = []
    runner = StreamRunner(
        node,
        on_detections=got.append,
        on_status=statuses.append,
        status_period_s=0.02,
        pipeline_depth=depth,  # 0 = synchronous; >=1 overlaps host+device
    ).start()

    N = 25

    def produce():
        for _ in range(N):
            runner.push(ranges, pose)
            time.sleep(0.002)

    t = threading.Thread(target=produce)
    t.start()
    t.join()
    runner.drain()
    runner.stop()

    # every pushed-and-accepted scan was processed; drops are accounted
    assert runner.stats.processed + runner.stats.dropped == N
    assert runner.stats.processed == len(got)
    assert runner.stats.processed >= 1
    assert len(statuses) >= 1
    assert int(node.state.step) == runner.stats.processed + 1
