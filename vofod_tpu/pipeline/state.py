"""Device-resident detector state, donated between steps.

The reference's three mutable grids under a mutex (m_voxel_map, m_voxel_flags,
m_voxel_raycast + atomics, vofod_nodelet.cpp:2324-2339) collapse to this
pytree: flags and the raycast helper grid are ephemeral values *inside* the
step (the deterministic schedule makes their cross-thread lifetime
unnecessary), so persistent state is just the confidence grid plus small
scalars and the warm-start mask of the background maintenance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vofod_tpu.config import DynParams, VoFODConfig

Array = jnp.ndarray


class VoFODState(NamedTuple):
    grid: Array  # float32 (nz, ny, nx) — occupancy-confidence scores
    safe: Array  # bool (nz, ny, nx) — warm start for sepclusters reachability
    det_counter: Array  # int32 — monotonic detection id (ref :845 m_last_detection_id)
    step: Array  # int32 — scan counter (drives periodic maintenance)
    sure_bg_sufficient: Array  # bool (ref m_sure_background_sufficient)
    bg_sufficient: Array  # bool (ref m_background_pts_sufficient)


def init_state(cfg: VoFODConfig, dyn: DynParams | None = None) -> VoFODState:
    """Fresh state — the ~reset service (ref reset(), vofod_nodelet.cpp:1610-1632):
    every voxel starts at scores/init."""
    dyn = dyn or DynParams()
    shape = cfg.grid_shape
    return VoFODState(
        grid=jnp.full(shape, float(dyn.score_init), jnp.float32),
        safe=jnp.zeros(shape, jnp.bool_),
        det_counter=jnp.int32(0),
        step=jnp.int32(0),
        sure_bg_sufficient=jnp.bool_(False),
        bg_sufficient=jnp.bool_(False),
    )


class ScanInput(NamedTuple):
    """One organized LiDAR scan + pose — the step's input (the reference's
    pc_t message + TF lookup, vofod_nodelet.cpp:882-928)."""

    ranges_mm: Array  # uint32/float32 [H*W] (0 = no return)
    intensity: Array  # float32 [H*W]
    pose: Array  # float32 [4, 4] — world_T_sensor


class PrebinnedScan(NamedTuple):
    """Host-binned scan for the prebinned ingest path (io/binner.py +
    native/frontend.cpp): the filter+transform+histogram half of the frontend
    runs on the host and the packed dense count grid rides the upload, so the
    device-side binning is a pure elementwise unpack — no scatter at all
    (pipeline/frontend.run_frontend_prebinned;
    make_step_fn(frontend_mode="prebinned"))."""

    packed: Array  # uint8 (nz, ny, nx): count & 0x3f | blocker_bit << 7
    active: Array  # uint8/bool [H*W] per-pixel raycast gate mask
    pose: Array  # float32 [4, 4] — world_T_sensor
    stats: Array  # int32 [2]: (n_valid_points, n_exclude_hits), host-counted


class Detections(NamedTuple):
    """Fixed-capacity detections output (msgs/Detection.msg fields)."""

    valid: Array  # bool [K]
    id: Array  # int32 [K]
    position: Array  # float32 [K, 3] — OBB center, world frame
    covariance: Array  # float32 [K, 3, 3]
    n_points: Array  # int32 [K]
    confidence: Array  # float32 [K]
    detection_probability: Array  # float32 [K]
    aabb_min: Array  # float32 [K, 3] (debug/viz parity)
    aabb_max: Array  # float32 [K, 3]
    cluster_class: Array  # int32 [K]: 0=invalid, 1=mav, 2=unknown (viz parity)
    obb_center: Array  # float32 [K, 3]
    obb_extent: Array  # float32 [K, 3] (half-extents along principal axes)
    obb_axes: Array  # float32 [K, 3, 3]


class StepDiagnostics(NamedTuple):
    """Observability signals (ref Status.msg + throttled logs)."""

    n_bg_voxels: Array  # int32 — voxels over new_obstacles (ref :713)
    bg_sufficient: Array  # bool
    sure_bg_sufficient: Array  # bool
    n_occupied: Array  # int32 — occupied voxels this scan
    n_far: Array  # int32 — far (non-background) voxels this scan
    far_overflow: Array  # bool — far voxels exceeded static capacity
    cc_converged: Array  # bool — clustering fixpoint reached within cap
    cc_iters: Array  # int32 — label-propagation sweeps this scan
    sep_converged: Array  # bool — sepclusters reachability converged
    n_detections: Array  # int32
