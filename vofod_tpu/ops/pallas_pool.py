"""Fused Pallas TPU kernel for Euclidean-ball pooling.

The XLA decomposition in morphology.py materializes ~35 intermediate grids per
pool (measured 0.74 ms on v5e for the 2.47M-voxel grid); since the clustering
loops run it ~10x per scan it dominates the step.  This kernel performs the
whole 123-tap stencil in one pass: each program DMAs a halo-padded z-slab from
HBM into VMEM, computes every (dz, dy, dx) tap as a static VMEM slice, and
reduces in registers — ~20 MB of DMA traffic total instead of ~70 full-grid
materializations.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vofod_tpu.ops.morphology import _ball_rows

_ZBLOCK = 8


def _combine(op):
    return {"min": jnp.minimum, "max": jnp.maximum, "sum": jnp.add}[op]


def _shift_x(a, d: int, fill):
    """out[..., x] = a[..., x + d], filled at the edge."""
    if d == 0:
        return a
    pad = jnp.full(a.shape[:-1] + (abs(d),), fill, a.dtype)
    if d > 0:
        return jnp.concatenate([a[..., d:], pad], axis=-1)
    return jnp.concatenate([pad, a[..., :d]], axis=-1)


def _shift_y(a, d: int, fill):
    """out[..., y, :] = a[..., y + d, :], filled at the edge."""
    if d == 0:
        return a
    pad = jnp.full(a.shape[:-2] + (abs(d), a.shape[-1]), fill, a.dtype)
    if d > 0:
        return jnp.concatenate([a[..., d:, :], pad], axis=-2)
    return jnp.concatenate([pad, a[..., :d, :]], axis=-2)


@functools.partial(
    jax.jit, static_argnames=("radius", "op", "fill", "interpret")
)
def pallas_ball_pool(a, radius: float, op: str, fill, interpret: bool = False):
    """out[v] = op over ball(radius) of a.  dtype f32 or i32."""
    nz, ny, nx = a.shape
    P = int(math.floor(radius))
    rows = _ball_rows(radius)
    comb = _combine(op)

    nzb = -(-nz // _ZBLOCK)
    # halo-pad; z padded to the block multiple, lateral dims padded to the
    # (8, 128) VMEM tile so whole rows can be DMA'd (Mosaic alignment rule)
    pny = -(-(ny + 2 * P) // 8) * 8
    pnx = -(-(nx + 2 * P) // 128) * 128
    padded = jnp.pad(
        a,
        (
            (P, P + nzb * _ZBLOCK - nz),
            (P, pny - ny - P),
            (P, pnx - nx - P),
        ),
        constant_values=fill,
    )
    slab_rows = _ZBLOCK + 2 * P

    widths = sorted({w for _, _, w in rows})

    def kernel(hbm_ref, o_ref, slab, sem):
        zb = pl.program_id(0)
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(zb * _ZBLOCK, slab_rows)], slab, sem
        )
        cp.start()
        cp.wait()
        # x-direction running pools over the whole slab, shared across rows
        full = slab[:]
        xpool = {0: full}
        prev = full
        for w in range(1, max(widths) + 1):
            prev = comb(
                comb(_shift_x(full, -w, fill), prev), _shift_x(full, w, fill)
            )
            if w in widths:
                xpool[w] = prev
        acc = None
        for dz, dy, w in rows:
            # slab row j holds padded z (zb*ZB + j); output rows are
            # zb*ZB + P + t for t in [0, ZB); lateral dims stay padded so
            # loads and the HBM store remain tile-aligned (crop by caller)
            tap = _shift_y(
                xpool[w][P + dz : P + dz + _ZBLOCK], dy, fill
            )
            acc = tap if acc is None else comb(acc, tap)
        o_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(nzb,),
        out_shape=jax.ShapeDtypeStruct((nzb * _ZBLOCK, pny, pnx), a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (_ZBLOCK, pny, pnx), lambda zb: (zb, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, pny, pnx), a.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(padded)
    return out[:nz, P : P + ny, P : P + nx]
