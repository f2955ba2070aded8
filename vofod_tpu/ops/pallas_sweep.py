"""Fused Pallas kernel for the plane-sweep transmittance raycast.

The XLA lowering of ops/raycast.py:_sweep_cones is a lax.scan whose per-plane
body is a handful of tiny fused stencil kernels; at ~2-6 us of fixed per-op
cost, the 241-step x/y-cone scan spends most of its ~1.2 ms on sequencing
overhead, not arithmetic (DESIGN.md §1: stencil FLOPs are ~free).  This
kernel runs the ENTIRE sweep as ONE Mosaic program:

* grid = (n_planes,) — TPU grid steps run sequentially on a core, so the
  carry plane lives in a VMEM scratch buffer across steps (~100-200 KB,
  far under the ~16 MB/core VMEM);
* the per-plane opacity/weight blocks are auto-pipelined HBM->VMEM by the
  BlockSpec machinery (double-buffered DMA overlaps the stencil math);
* the body is the same bf16 4-tap separable lerp as the scan body — the
  arithmetic per element is identical, so outputs match the XLA path
  bit-for-bit (tests/test_pallas_sweep.py asserts exact equality).

Opt-in via VOFOD_PALLAS_SWEEP=1 (TPU only); ops/raycast.py routes both cone
groups here.  Reference behavior covered: the raycast thread's freespace
update (vofod_nodelet.cpp:1396-1606) — this kernel only accelerates the
TPU-native sweep formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _shift_fill1(x: Array, d: int, axis: int) -> Array:
    """out[..i..] = x[..i+d..] along ``axis``; 1.0 beyond the edge — the
    same slice+concat construction as ops/raycast.py:_shifted (pltpu.roll on
    a 3-D sublane axis lowers through an unsupported gather)."""
    if d == 0:
        return x
    n = x.shape[axis]
    if d > 0:
        sl = jax.lax.slice_in_dim(x, d, n, axis=axis)
        fill = jnp.ones_like(jax.lax.slice_in_dim(x, 0, d, axis=axis))
        return jnp.concatenate([sl, fill], axis=axis)
    sl = jax.lax.slice_in_dim(x, 0, n + d, axis=axis)
    fill = jnp.ones_like(jax.lax.slice_in_dim(x, 0, -d, axis=axis))
    return jnp.concatenate([fill, sl], axis=axis)


def _sweep_kernel(opaq_ref, wa_ref, wb_ref, seed_ref, t_ref, carry_ref):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        carry_ref[:] = jnp.ones_like(carry_ref)

    p = carry_ref[:]  # [C, nA, nB] bf16
    # taps leading, broadcast dims pre-inserted host-side: integer tap
    # indexing is a cheap major-dim offset (no gather) and no in-kernel
    # reshape is needed (Mosaic rejects rank-changing shape casts)
    wa = wa_ref[0]  # [4, C, nA, 1]
    wb = wb_ref[0]  # [4, C, 1, nB]

    # lateral-B lerp (lane axis), then lateral-A lerp (sublane axis) — the
    # same evaluation order and operand order as the scan body
    q = (
        wb[0] * _shift_fill1(p, -1, 2)
        + wb[1] * p
        + wb[2] * _shift_fill1(p, 1, 2)
        + wb[3] * _shift_fill1(p, 2, 2)
    )
    t_in = (
        wa[0] * _shift_fill1(q, -1, 1)
        + wa[1] * q
        + wa[2] * _shift_fill1(q, 1, 1)
        + wa[3] * _shift_fill1(q, 2, 1)
    )
    # seed is exactly 0.0 or 1.0, so select arithmetically — equivalent to
    # where(seed, 1, t) bit-for-bit (x*1 and x+0 are exact in bf16) while
    # avoiding bf16 vector comparisons and sublane+lane broadcasts, neither
    # of which Mosaic supports on this target.  [C, nA, 1]: lane broadcast.
    sd = seed_ref[0]
    t_in = sd + (jnp.bfloat16(1.0) - sd) * t_in
    t_ref[0] = t_in
    carry_ref[:] = t_in * (jnp.bfloat16(1.0) - opaq_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_sweep_cones(
    opaq_sc: Array,
    rel_s: Array,
    rel_a: Array,
    rel_b: Array,
    interpret: bool = False,
) -> Array:
    """Drop-in for ops/raycast.py:_sweep_cones (same contract; see there).

    opaq_sc: [nS, C, nA, nB]; rel_s: [nS, C]; rel_a: [C, nA]; rel_b: [C, nB]
    -> float32 [nS, C, nA, nB] transmittance.
    """
    from vofod_tpu.ops.raycast import _tap_weights

    nS, C, nA, nB = opaq_sc.shape
    # taps moved to axis 1 + unit broadcast dims inserted (see kernel):
    # wa [nS, 4, C, nA, 1]; wb [nS, 4, C, 1, nB]
    wa = jnp.moveaxis(
        _tap_weights(rel_s, rel_a).astype(jnp.bfloat16), -1, 1
    )[..., None]
    wb = jnp.moveaxis(
        _tap_weights(rel_s, rel_b).astype(jnp.bfloat16), -1, 1
    )[:, :, :, None, :]
    # [nS, C, nA, 1] — materialized along the sublane dim (Mosaic supports
    # lane-only broadcasts); trailing unit dim keeps the tiling legal
    seed = jnp.broadcast_to(
        (rel_s <= 1.0).astype(jnp.bfloat16)[:, :, None, None],
        (nS, C, nA, 1),
    )

    t = pl.pallas_call(
        _sweep_kernel,
        grid=(nS,),
        in_specs=[
            pl.BlockSpec(
                (1, C, nA, nB), lambda s: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, C, nA, 1), lambda s: (s, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, C, 1, nB), lambda s: (s, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C, nA, 1), lambda s: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, C, nA, nB), lambda s: (s, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nS, C, nA, nB), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((C, nA, nB), jnp.bfloat16)],
        interpret=interpret,
    )(opaq_sc.astype(jnp.bfloat16), wa, wb, seed)
    return t.astype(jnp.float32)


def use_pallas_sweep() -> bool:
    """Opt-in gate (mirrors ops/morphology._use_pallas): TPU backend and
    VOFOD_PALLAS_SWEEP=1."""
    import os

    if os.environ.get("VOFOD_PALLAS_SWEEP") != "1":
        return False
    import jax as _jax

    return _jax.default_backend() == "tpu"
