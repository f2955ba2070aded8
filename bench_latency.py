#!/usr/bin/env python
"""Per-scan latency benchmark: p50/p90 scan -> detections, host-to-host.

Measures the full serving path the reference's delay log covers
(vofod_nodelet.cpp:1094-1095): host scan array -> device transfer -> jitted
step -> detection readback.  Complements bench.py (throughput: steps chained
on-device).  Note: on a tunneled device the host<->device legs include relay
round-trips, so treat absolute numbers as an upper bound; on a directly
attached chip they shrink to PCIe/ICI transfer times.

Prints one JSON line (informational; bench.py remains the driver metric).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vofod_tpu.config import DynParams, VoFODConfig
    from vofod_tpu.io.scan_source import Scene, hover_pose, render_scan
    from vofod_tpu.runtime.node import NodeOptions, VoFOD

    cfg = VoFODConfig()
    node = VoFOD(cfg, DynParams(), NodeOptions(raycast_mode="sweep"))
    xs = np.arange(30.0, 50.0, 0.4)
    gx, gy = np.meshgrid(xs, xs - 10.0)
    node.load_apriori_map(
        np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, -1.0)], axis=1)
    )
    scene = Scene(ground_z=-1.0)
    scene.add_sphere(center=(25.0, 15.0, 6.0), radius=0.5)
    pose = hover_pose((40.0, 20.0, 3.0))
    ranges = render_scan(scene, node.lut, pose)

    for _ in range(10):  # compile + converge
        node.process_scan(ranges, None, pose)

    lat = []
    for i in range(30):
        t0 = time.perf_counter()
        msg = node.process_scan(ranges, None, pose)
        lat.append(time.perf_counter() - t0)
    lat = np.array(sorted(lat)) * 1e3
    print(
        json.dumps(
            {
                "metric": "scan_to_detection_latency_host_to_host",
                "p50_ms": round(float(np.percentile(lat, 50)), 2),
                "p90_ms": round(float(np.percentile(lat, 90)), 2),
                "unit": "ms",
            }
        )
    )


if __name__ == "__main__":
    main()
