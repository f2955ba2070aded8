"""Background separation + voxel-map point update.

Covers three reference stages on dense grids:

* background sufficiency gate (ref findCloseFarClusters head,
  vofod_nodelet.cpp:713-725),
* Euclidean clustering + close/far split (ref clusterCloud :689-698 +
  findCloseFarClusters :728-750) — closeness is a component-wide property,
  computed together with the component labels in ONE seeded min-label
  propagation (ops/components.py label_components_seeded); the seeds are the
  occupied voxels whose hasCloseTo ball query over the background mask
  succeeds (ref voxel_map.cpp:376-400), evaluated for all voxels at once by a
  ball max-pool,
* the weighted EMA point update (ref updateVoxel :776-796:
  ``w = 2^-count; map = w*map + (1-w)*score``) with close clusters pulling
  toward scores/point and far clusters toward scores/unknown (ref :946-948).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vofod_tpu.config import DynParams, VoFODConfig
from vofod_tpu.parallel.gridops import DENSE

Array = jnp.ndarray


class BackgroundOut(NamedTuple):
    grid: Array  # updated confidence grid
    occupied: Array  # bool — voxels with points this scan (the "flags")
    far: Array  # bool — occupied, not background-connected
    close: Array
    labels: Array  # int32 component labels (SENTINEL off-mask)
    n_bg_voxels: Array
    bg_sufficient: Array
    cc_converged: Array
    cc_iters: Array


def split_and_update(
    cfg: VoFODConfig, dyn: DynParams, grid_vals: Array, counts: Array,
    prev_bg_sufficient: Array | bool = False,
    ops=DENSE,
) -> BackgroundOut:
    if cfg.dynamic_radii:
        # live-tunable radius (ref dynamic_reconfigure ground_points_max_-
        # distance): compile at the static bound, gate taps by traced r²
        # (ops/morphology._ball_pool_traced) — no recompile on change
        bound_m = cfg.ground_points_max_distance_bound
        if bound_m <= 0:  # documented: bounds <= 0 default to the static value
            bound_m = cfg.ground_points_max_distance
        bound = bound_m / cfg.voxel_size
        r_idx = dyn.ground_points_max_distance / cfg.voxel_size
        traced_r2 = jnp.minimum(r_idx * r_idx, jnp.float32(bound * bound))
        radius = bound
    else:
        traced_r2 = None
        radius = cfg.ground_points_max_distance / cfg.voxel_size

    # --- background sufficiency (pre-update map, like the reference) --------
    # STICKY like the reference's m_background_pts_sufficient: set once when
    # the count crosses the threshold (ref :718-720), cleared only by reset
    # (ref :284) — a later raycast-driven dip below the threshold does not
    # deactivate classification.
    bg_mask = grid_vals > dyn.thr_new_obstacles
    n_bg = ops.gsum(bg_mask).astype(jnp.int32)
    bg_sufficient = jnp.asarray(prev_bg_sufficient) | (
        n_bg > cfg.background_min_sufficient_pts
    )

    # --- close/far split + component labels (one propagation) ---------------
    occupied = counts > 0
    if cfg.compat_hascloseto_bounds:
        # ref hasCloseTo (voxel_map.cpp:376-400) searches the index box
        # [idx - ceil(r), idx + ceil(r)) — EXCLUSIVE upper bound, so the
        # +ceil(r) layer on each axis is never examined.  At exactly-integer
        # radii (the shipped config: 1.5 m / 0.5 m = 3.0) this drops the
        # three positive axis-extreme offsets.  Bug-for-bug reproduction for
        # parity studies; the spec-correct default uses the symmetric ball.
        from vofod_tpu.ops.morphology import hascloseto_pool_any

        bg_near = hascloseto_pool_any(bg_mask, radius)
    else:
        bg_near = (
            ops.pool_max(
                bg_mask.astype(jnp.int8), radius, fill=0, traced_r2=traced_r2
            )
            > 0
        )
    seed = occupied & bg_near
    labels, close, cc_converged, cc_iters = ops.label_seeded(
        occupied, seed, radius, cfg.cc_sweeps, traced_r2=traced_r2
    )
    far = occupied & ~close

    return _finish(
        cfg, dyn, grid_vals, counts, occupied, far, close, labels,
        n_bg, bg_sufficient, cc_converged, cc_iters,
    )


def _finish(cfg, dyn, grid_vals, counts, occupied, far, close, labels,
            n_bg, bg_sufficient, cc_converged, cc_iters) -> BackgroundOut:
    # --- EMA point update (ref updateVoxel :789-795) --------------------------
    w = jnp.exp2(-jnp.clip(counts, 0, 63).astype(jnp.float32))
    score = jnp.where(close, dyn.score_point, dyn.score_unknown)
    new_vals = jnp.where(occupied, w * grid_vals + (1.0 - w) * score, grid_vals)

    return BackgroundOut(
        grid=new_vals,
        occupied=occupied,
        far=far,
        close=close,
        labels=labels,
        n_bg_voxels=n_bg,
        bg_sufficient=bg_sufficient,
        cc_converged=cc_converged,
        cc_iters=cc_iters,
    )
