"""Detection extraction: confidence submap score, covariance, pdet.

Reference: extractDetections (vofod_nodelet.cpp:833-880).  For every cluster
classified mav:

* covariance = sqrt(dist) * position_sigma * I (ref :849),
* confidence: copy a submap around the AABB inflated by 2 voxels, set the
  cluster's own voxels to the ray score, accumulate
  uncertainty = sum(1 - val/ray_score) / n_points, confidence =
  exp(-uncertainty) (ref :851-867),
* detection probability from the sensor's angular resolutions (ref :869-874).

The dynamic-size submap becomes a fixed CSxCSxCS window around the AABB center
masked to the true inflated-AABB box (a mav cluster is <= max_size = 3 m, so
the window always covers it with the default 16-voxel side).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vofod_tpu.config import DynParams, VoFODConfig
from vofod_tpu.geometry import GridSpec
from vofod_tpu.parallel.gridops import DENSE
from vofod_tpu.pipeline.classify import CLS_MAV, ClassifyOut
from vofod_tpu.pipeline.state import Detections

Array = jnp.ndarray


def extract_detections(
    cfg: VoFODConfig,
    dyn: DynParams,
    grid: GridSpec,
    grid_vals: Array,
    labels: Array,  # dense far-component labels (for member lookup)
    far: Array,
    cls_out: ClassifyOut,
    sensor_pos: Array,
    det_counter: Array,
    ops=DENSE,
) -> tuple[Detections, Array]:
    K = cfg.max_clusters
    CS = cfg.confidence_submap
    half = CS // 2

    is_mav = cls_out.cluster_class == CLS_MAV
    dist = jnp.linalg.norm(cls_out.obb_center - sensor_pos[None, :], axis=-1)

    # --- confidence from the inflated-AABB submap -----------------------------
    # integer index boxes of the submap: AABB corners -> idx, inflate by 2,
    # clamp to the grid (ref getSubmapCopy, voxel_map.cpp:547-571)
    lo_i = jnp.stack(grid.coord_to_idx(cls_out.aabb_min), axis=-1)  # [K,3] (x,y,z)
    hi_i = jnp.stack(grid.coord_to_idx(cls_out.aabb_max), axis=-1)
    sizes = jnp.array([grid.nx, grid.ny, grid.nz], jnp.int32)
    lo_i = jnp.clip(lo_i - 2, 0, sizes - 1)
    hi_i = jnp.clip(hi_i + 2, 0, sizes - 1)
    ctr_i = (lo_i + hi_i) // 2  # window center

    sub_vals, sub_far, sub_lab = ops.submaps3(grid_vals, far, labels, ctr_i, CS)

    r = jnp.arange(CS, dtype=jnp.int32)

    def one_cluster(k, vals, fmask, lab):
        cx, cy, cz = ctr_i[k, 0], ctr_i[k, 1], ctr_i[k, 2]
        # absolute indices of window voxels: array position a holds grid
        # index ctr - half + a (submaps3 slices [ctr-half, ctr+half))
        zz = jnp.broadcast_to((cz - half + r)[:, None, None], (CS, CS, CS))
        yy = jnp.broadcast_to((cy - half + r)[None, :, None], (CS, CS, CS))
        xx = jnp.broadcast_to((cx - half + r)[None, None, :], (CS, CS, CS))
        inbox = (
            (xx >= lo_i[k, 0]) & (xx <= hi_i[k, 0])
            & (yy >= lo_i[k, 1]) & (yy <= hi_i[k, 1])
            & (zz >= lo_i[k, 2]) & (zz <= hi_i[k, 2])
        )
        member = fmask & (lab == cls_out.reps[k])
        # member voxels count as free air (ref :855-860)
        v_eff = jnp.where(member, dyn.score_ray, vals)
        contrib = jnp.where(inbox, 1.0 - v_eff / dyn.score_ray, 0.0)
        unc = contrib.sum() / jnp.maximum(cls_out.n_points[k], 1).astype(jnp.float32)
        return jnp.exp(-unc)

    confidence = jax.vmap(one_cluster)(jnp.arange(K), sub_vals, sub_far, sub_lab)
    confidence = jnp.where(is_mav, confidence, 0.0)

    # --- detection probability (ref :869-874) ---------------------------------
    vres = cfg.sensor.vertical_fov / cfg.sensor.vertical_rays
    hres = 2.0 * math.pi / cfg.sensor.horizontal_rays
    ang = jnp.arctan(1.0 / jnp.maximum(dist, 1e-6))
    pdet_v = jnp.minimum(ang / (vres * dyn.cls_min_points), 1.0)
    pdet_h = jnp.minimum(ang / hres, 1.0)
    pdet = pdet_v * pdet_h

    # --- covariance (ref :849) -------------------------------------------------
    sigma = jnp.sqrt(jnp.maximum(dist, 0.0)) * dyn.output_position_sigma
    cov = sigma[:, None, None] * jnp.eye(3)[None, :, :]

    # --- ids: monotonic counter over valid detections (ref :845) ---------------
    order = jnp.cumsum(is_mav.astype(jnp.int32)) - 1
    ids = det_counter + jnp.where(is_mav, order, 0)
    new_counter = det_counter + is_mav.sum().astype(jnp.int32)

    dets = Detections(
        valid=is_mav,
        id=ids.astype(jnp.int32),
        position=cls_out.obb_center,
        covariance=cov,
        n_points=cls_out.n_points,
        confidence=confidence,
        detection_probability=jnp.where(is_mav, pdet, 0.0),
        aabb_min=cls_out.aabb_min,
        aabb_max=cls_out.aabb_max,
        cluster_class=cls_out.cluster_class,
        obb_center=cls_out.obb_center,
        obb_extent=cls_out.obb_extent,
        obb_axes=cls_out.obb_axes,
    )
    return dets, new_counter
