"""Background separation + voxel-map point update.

Covers three reference stages on dense grids:

* background sufficiency gate (ref findCloseFarClusters head,
  vofod_nodelet.cpp:713-725),
* Euclidean clustering + close/far split (ref clusterCloud :689-698 +
  findCloseFarClusters :728-750) — closeness is a component-wide property, so
  seeded reachability through the occupied set under ball adjacency computes
  the exact is_close flag of every cluster without materializing close-cluster
  labels (see ops/components.py),
* the weighted EMA point update (ref updateVoxel :776-796:
  ``w = 2^-count; map = w*map + (1-w)*score``) with close clusters pulling
  toward scores/point and far clusters toward scores/unknown (ref :946-948).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vofod_tpu.config import DynParams, VoFODConfig

from vofod_tpu.ops.components import propagate_reach
from vofod_tpu.ops.morphology import ball_pool_max

Array = jnp.ndarray


class BackgroundOut(NamedTuple):
    grid: Array  # updated confidence grid
    occupied: Array  # bool — voxels with points this scan (the "flags")
    far: Array  # bool — occupied, not background-connected
    close: Array
    n_bg_voxels: Array
    bg_sufficient: Array
    cc_converged: Array


def split_and_update(
    cfg: VoFODConfig, dyn: DynParams, grid_vals: Array, counts: Array
) -> BackgroundOut:
    radius = cfg.ground_points_max_distance / cfg.voxel_size

    # --- background sufficiency (pre-update map, like the reference) --------
    bg_mask = grid_vals > dyn.thr_new_obstacles
    n_bg = bg_mask.sum().astype(jnp.int32)
    bg_sufficient = n_bg > cfg.background_min_sufficient_pts

    # --- close/far split ------------------------------------------------------
    occupied = counts > 0
    # hasCloseTo ball query for every voxel at once (ref voxel_map.cpp:376-400)
    bg_near = ball_pool_max(bg_mask.astype(jnp.uint8), radius, fill=0) > 0
    seed = occupied & bg_near
    close, cc_converged = propagate_reach(occupied, seed, radius, cfg.max_cc_iters)
    far = occupied & ~close

    # --- EMA point update (ref updateVoxel :789-795) --------------------------
    w = jnp.exp2(-jnp.clip(counts, 0, 63).astype(jnp.float32))
    score = jnp.where(close, dyn.score_point, dyn.score_unknown)
    new_vals = jnp.where(occupied, w * grid_vals + (1.0 - w) * score, grid_vals)

    return BackgroundOut(
        grid=new_vals,
        occupied=occupied,
        far=far,
        close=close,
        n_bg_voxels=n_bg,
        bg_sufficient=bg_sufficient,
        cc_converged=cc_converged,
    )
