"""Grid-sharded full detection step: one operation area across many chips.

The stream-DP path (parallel/sharding.py) scales the number of independent
sensor feeds; THIS module scales a single feed's operation area beyond one
chip's HBM, the axis SURVEY.md §5 names for giant maps (the reference caps
its VoxelMap at one machine's RAM; its 2.47M-voxel sim workload uses ~10 MB;
a 0.5 m voxel over a 500 m × 500 m × 250 m oparea is ~2 GB of f32 state —
already several chips' worth once the pipeline's working set (halos, pools,
label keys, sweep carries) multiplies it).  Flat voxel ids and label keys
are int32 with a seed-flag offset of n_voxels, so the supported ceiling is
n_voxels ≤ 2^30 (~4 GB of f32 grid per array) — validated with a clear
error in :func:`make_grid_sharded_step`; beyond that the id math would need
int64 throughout.

Design: the confidence grid and the sepclusters warm-start mask shard along
Z (the leading, non-lane grid axis — shards keep full (8, 128) sublane/lane
tiles).  The WHOLE step runs inside ONE shard_map with the stage code of
pipeline/*.py unchanged — every dense-grid primitive routes through
parallel/gridops.ZShardOps:

* stencil pools / label propagation: halo slabs over ICI per sweep
  (multi-hop when the halo exceeds the shard height);
* point binning: the scan is replicated (131k points ≪ grid); each shard
  scatters only locally-owned points — no all-to-all at all;
* compaction: per-shard lists + all_gather + ordered merge (Z-major flat
  ids make shard-major concatenation globally ascending);
* explore/demotions: owner-shard submap extraction on halo-extended slabs;
  demotion min-writes fold back onto neighbors (min is idempotent and
  commutative, so the fold is exact);
* sweep raycast: x/y cones lateral-sharded (carry-halo ppermute per plane),
  z cones pipelined across shards (ops/raycast.py);
* scalars/flags/detection lists: replicated via psum/pmax.

Every output matches the unsharded step BIT-FOR-BIT (tests/test_grid_step.py
asserts exact equality of grids, detections and diagnostics on an 8-device
mesh), so the sharded step is a drop-in for oversized operation areas.

Cost model (v5e): steady-state halo traffic per step is ~stencil_sweeps ×
2r × ny × nx × 4 B ≈ a few MB over ICI — negligible against the ~ms of
stencil compute it overlaps with.  The z-cone pipeline is the one
sequential stage: wall-clock equal to the unsharded sweep (the recurrence
is inherently ordered), compute replicated n×, memory 1/n — acceptable
because the z cones are the cheapest pair (nz ≪ nx, ny in every real
config).
"""

from __future__ import annotations

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vofod_tpu.config import DynParams, VoFODConfig
from vofod_tpu.parallel.gridops import ZShardOps
from vofod_tpu.pipeline.state import VoFODState, init_state
from vofod_tpu.pipeline.step import make_step_fn
from vofod_tpu.sensor import XyzLut


def _state_specs(axis: str) -> VoFODState:
    g = P(axis, None, None)
    return VoFODState(
        grid=g,
        safe=g,
        det_counter=P(),
        step=P(),
        sure_bg_sufficient=P(),
        bg_sufficient=P(),
    )


def init_grid_sharded_state(
    cfg: VoFODConfig,
    dyn: DynParams,
    mesh: Mesh,
    axis: str = "grid",
) -> VoFODState:
    """Fresh state with the dense grids Z-sharded over the mesh."""
    s0 = init_state(cfg, dyn)
    specs = _state_specs(axis)
    return jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), s0, specs
    )


def shard_state(state: VoFODState, mesh: Mesh, axis: str = "grid") -> VoFODState:
    """Re-shard an existing (e.g. snapshot-loaded) state onto the mesh."""
    specs = _state_specs(axis)
    return jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), state, specs
    )


def make_grid_sharded_step(
    cfg: VoFODConfig,
    lut: XyzLut,
    mesh: Mesh,
    axis: str = "grid",
    zcone_mode: str = "pipelined",
    **step_kw,
):
    """Build the jitted Z-sharded step (same signature as make_step_fn's
    product: ``(state, scan, dyn) -> (state, StepOutput)`` with state grids
    sharded ``P(axis, None, None)`` and everything else replicated).

    Requires ``nz % mesh.shape[axis] == 0`` (pad the operation-area height to
    a multiple — the extra planes are inert) and a shard height of at least
    2 planes for the sweep's lateral halo taps.

    ``zcone_mode`` selects the sweep raycast's z-cone strategy (bit-identical
    results either way, ops/raycast.py raycast_sweep_zsharded): "pipelined"
    replays the full-plane scan once per shard (minimal ICI, compute
    replicated n×); "transpose" all_to_alls the cone volume to
    lateral-sharded and back so per-shard z-cone FLOPs drop n× — prefer it
    once n is large enough that the replicated full-plane z scan rivals the
    sharded x/y group's per-shard work (n ≳ 3 on the flagship geometry).
    """
    n = int(mesh.shape[axis])
    nz, _, _ = cfg.grid_shape
    if nz % n:
        raise ValueError(
            f"grid nz={nz} not divisible by mesh axis '{axis}' size {n}; "
            "pad the operation-area height"
        )
    if nz // n < 2:
        raise ValueError(f"shard height {nz // n} < 2 planes (nz={nz}, n={n})")
    nv = cfg.grid_shape[0] * cfg.grid_shape[1] * cfg.grid_shape[2]
    if nv > 2**30:
        # label_seeded keys use flat_id + (1-seed)*n_voxels in int32, so
        # 2*n_voxels must stay below 2^31 — larger grids would silently
        # overflow ids/labels rather than fail.
        raise ValueError(
            f"n_voxels={nv} exceeds the int32 id/key ceiling of 2^30 "
            "(~4 GB f32 grid); shrink the oparea or coarsen the voxel size"
        )
    if cfg.sepclusters_exact_census:
        import math

        mv = math.ceil(cfg.sepclusters_max_bg_distance / cfg.voxel_size)
        lsz = max(mv - 1, 1)
        if (nz // n) % lsz:
            raise ValueError(
                f"exact-census coarse leaf {lsz} must divide the shard "
                f"height {nz // n} (pad the operation-area height)"
            )
        # compat_counted_indexing composes (pipeline/sepclusters.py
        # _quirk_sure_counts_sharded) — it replicates one int32 rank table
        # of the full grid size, a documented parity-mode cost

    ops = ZShardOps(axis, n, zcone_mode=zcone_mode)
    step = make_step_fn(
        cfg, lut, donate=False, jit=False, ops=ops, **step_kw
    )
    sspec = _state_specs(axis)
    if step_kw.get("frontend_mode") == "prebinned":
        # the packed host-binned count grid shards along Z with the state;
        # active mask / pose / stats are replicated (pipeline/state.py)
        from vofod_tpu.pipeline.state import PrebinnedScan

        scan_spec = PrebinnedScan(
            packed=P(axis, None, None), active=P(), pose=P(), stats=P()
        )
    else:
        scan_spec = P()
    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(sspec, scan_spec, P()),
        out_specs=(sspec, P()),
        # replicated-output inference would have to see through psum-carried
        # while loops; outputs are replicated by construction (psum/pmax)
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_grid_mesh(n_devices: int | None = None, axis: str = "grid") -> Mesh:
    devs = jax.devices()
    nd = n_devices or len(devs)
    return Mesh(np.array(devs[:nd]), (axis,))
