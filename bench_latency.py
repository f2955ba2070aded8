#!/usr/bin/env python
"""Per-scan latency benchmark: p50/p90 scan -> detections, host-to-host.

Measures the full serving path the reference's delay log covers
(vofod_nodelet.cpp:1094-1095): host scan array -> host binning -> device
transfer -> jitted step -> detection readback.  Complements bench.py
(throughput: steps chained on-device).  Three numbers:

* ``relay_floor_ms``: round trip of a 4-byte upload + trivial op + 4-byte
  readback — the pure transport floor.  On the tunneled dev setup this is
  tens of ms (two relay round-trips); on directly attached hardware it is
  sub-ms, and every number below shrinks accordingly.
* ``p50/p90_ms``: synchronous per-scan latency (process_scan).
* ``pipelined_period_p50_ms``: steady-state per-scan period with the stream
  runner's one-deep pipeline (process_scan_async: scan k+1's host work and
  upload overlap scan k's device step) — the serving-rate number; per-scan
  LATENCY stays ~p50 (pipelining hides the transport in the period, not in
  the response time).

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

    # transport floor: tiny upload -> trivial op -> tiny readback
    f = jax.jit(lambda x: x + 1.0)
    _ = float(f(jnp.zeros(1))[0])
    floors = []
    for i in range(15):
        t0 = time.perf_counter()
        _ = float(f(jnp.full(1, float(i)))[0])
        floors.append(time.perf_counter() - t0)
    relay_floor_ms = float(np.percentile(np.array(floors) * 1e3, 50))

    cfg = VoFODConfig()
    node = VoFOD(
        cfg, DynParams(),
        NodeOptions(raycast_mode="sweep", frontend_mode="prebinned"),
    )
    xs = np.arange(30.0, 50.0, 0.4)
    gx, gy = np.meshgrid(xs, xs - 10.0)
    node.load_apriori_map(
        np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, -1.0)], axis=1)
    )
    # content-varying scan cycle (identical repeated calls can be memoized
    # on the tunneled setup — CLAUDE.md)
    scans = []
    for k in range(8):
        a = 2.0 * np.pi * k / 8
        scene = Scene(ground_z=-1.0)
        scene.add_sphere(
            center=(25.0 + 3 * np.cos(a), 15.0 + 3 * np.sin(a), 6.0),
            radius=0.5,
        )
        pose = hover_pose((40.0 + np.cos(a), 20.0 + np.sin(a), 3.0))
        scans.append((render_scan(scene, node.lut, pose), pose))

    for k in range(10):  # compile + converge
        node.process_scan(scans[k % 8][0], None, scans[k % 8][1])

    lat = []
    for i in range(30):
        t0 = time.perf_counter()
        node.process_scan(scans[i % 8][0], None, scans[i % 8][1])
        lat.append(time.perf_counter() - t0)
    lat = np.array(sorted(lat)) * 1e3

    # one-deep pipeline: dispatch k+1 before fetching k (StreamRunner's loop)
    periods = []
    pending = node.process_scan_async(scans[0][0], None, scans[0][1])
    t_prev = time.perf_counter()
    for i in range(1, 31):
        nxt = node.process_scan_async(scans[i % 8][0], None, scans[i % 8][1])
        node.fetch_result(pending)
        pending = nxt
        now = time.perf_counter()
        periods.append(now - t_prev)
        t_prev = now
    node.fetch_result(pending)
    periods = np.array(sorted(periods)) * 1e3

    print(
        json.dumps(
            {
                "metric": "scan_to_detection_latency_host_to_host",
                "relay_floor_ms": round(relay_floor_ms, 2),
                "p50_ms": round(float(np.percentile(lat, 50)), 2),
                "p90_ms": round(float(np.percentile(lat, 90)), 2),
                "pipelined_period_p50_ms": round(
                    float(np.percentile(periods, 50)), 2
                ),
                "unit": "ms",
            }
        )
    )


if __name__ == "__main__":
    main()
