"""Fixed-capacity stream compaction without large scatters or sorts.

``masked_compact(mask, capacity)`` returns the flat indices of the first
``capacity`` set elements of a boolean grid.  This is the TPU-native
replacement for the reference's dynamic containers (PCL index vectors,
std::vector<PointIndices>) and is the bridge from dense grids to the small
per-cluster computations of the classification stage.

Why not top_k / sort / scatter?  Measured on v5e: ``lax.top_k`` over 2.5M is
~24 ms and large scatters serialize at ~8 ns/update.  Instead we do:

1. a dense block-count + running sum along the last axis (vectorized),
2. an exclusive scan over ~5k block totals (tiny),
3. per output slot, a two-level binary search (block, then position inside the
   block's running sum) — ``capacity * (log nblocks + log blocksize)``
   single-element gathers, microseconds for capacity ≤ 1k.

Everything is O(N) dense work plus O(capacity log N) tiny gathers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_BLOCK = 1024


def masked_compact(mask: Array, capacity: int) -> tuple[Array, Array, Array]:
    """Extract flat indices of set elements, in ascending index order.

    Args:
      mask: boolean array (any shape; flattened internally).
      capacity: static output size.

    Returns:
      (ids, valid, total):
        ids   int32 [capacity] — flat indices of the first ``capacity`` set
              elements (ascending); entries beyond ``total`` are clamped
              to 0 and flagged invalid.
        valid bool  [capacity] — slot validity.
        total int32 scalar — number of set elements in the whole mask
              (may exceed capacity; callers use this as the overflow signal).
    """
    flat = mask.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    nb = -(-n // _BLOCK)
    padded = jnp.zeros((nb * _BLOCK,), jnp.int32).at[:n].set(flat)
    blocks = padded.reshape(nb, _BLOCK)
    # inclusive running count inside each block, and per-block totals
    run = jnp.cumsum(blocks, axis=1)  # [nb, B]
    btot = run[:, -1]  # [nb]
    bstart = jnp.cumsum(btot) - btot  # exclusive prefix over blocks [nb]
    total = btot.sum()

    q = jnp.arange(capacity, dtype=jnp.int32)

    # block containing the q-th set element: last block with bstart <= q
    # (binary search over the monotone bstart array)
    def find_block(qi):
        def body(state, _):
            lo, hi = state  # invariant: bstart[lo] <= qi < bstart[hi] (hi excl)
            mid = (lo + hi) // 2
            go_right = bstart[mid] <= qi
            return (jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)), None

        steps = max(1, int(math.ceil(math.log2(max(nb, 2)))) + 1)
        (lo, _), _ = jax.lax.scan(body, (jnp.int32(0), jnp.int32(nb)), None, length=steps)
        return lo

    blk = jax.vmap(find_block)(q)  # [capacity]
    local_rank = q - bstart[blk]  # 0-based rank inside block

    # position inside the block: first column with run[blk, col] == rank+1
    def find_pos(b, r):
        def body(state, _):
            lo, hi = state
            mid = (lo + hi) // 2
            go_right = run[b, mid] <= r  # want first col with run > r
            return (jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)), None

        steps = max(1, int(math.ceil(math.log2(_BLOCK))) + 1)
        (lo, _), _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.int32(_BLOCK)), None, length=steps
        )
        return lo

    pos = jax.vmap(find_pos)(blk, local_rank)
    ids = blk * _BLOCK + pos
    valid = q < total
    ids = jnp.where(valid, jnp.minimum(ids, n - 1), 0).astype(jnp.int32)
    return ids, valid, total.astype(jnp.int32)
