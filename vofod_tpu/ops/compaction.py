"""Fixed-capacity stream compaction without large scatters or sorts.

``masked_compact(mask, capacity)`` returns the flat indices of the first
``capacity`` set elements of a boolean grid.  This is the TPU-native
replacement for the reference's dynamic containers (PCL index vectors,
std::vector<PointIndices>) and is the bridge from dense grids to the small
per-cluster computations of the classification stage.

Why not top_k / sort / scatter?  Measured on v5e: ``lax.top_k`` over 2.5M is
~24 ms and large scatters serialize at ~8 ns/update.  Instead we do:

1. a dense block-count + running sum along the last axis (vectorized),
2. an exclusive scan over ~2.5k block totals (tiny),
3. per output slot, a dense rank over block starts ([capacity, nblocks]
   compare+sum — pure VPU) and a contiguous row-gather of the chosen blocks'
   running sums + dense rank for the in-block position.  Scalar-gather binary
   searches here measured ~10x slower (~1.5 ms/step across the pipeline's
   three compactions on v5e).

Everything is O(N + capacity*(nblocks+blocksize)) dense work plus one
row-gather of ``capacity`` contiguous 1k slices.
"""

from __future__ import annotations

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

    # block containing the q-th set element: last block with bstart <= q.
    # Dense vectorized rank instead of a binary search: [capacity, nb]
    # compare + row-sum is pure VPU work (scalar-gather search loops measure
    # ~10x slower on v5e).
    blk = (
        jnp.sum(bstart[None, :] <= q[:, None], axis=1).astype(jnp.int32) - 1
    )
    blk = jnp.maximum(blk, 0)
    local_rank = q - bstart[blk]  # 0-based rank inside block

    # position inside the block: first column with run > rank.  Row-gather of
    # the needed blocks (contiguous 1024-slices, embedding-lookup shape the
    # TPU handles well) + dense count.
    rows = run[blk]  # [capacity, _BLOCK]
    pos = jnp.sum(rows <= local_rank[:, None], axis=1).astype(jnp.int32)
    ids = blk * _BLOCK + pos
    valid = q < total
    ids = jnp.where(valid, jnp.minimum(ids, n - 1), 0).astype(jnp.int32)
    return ids, valid, total.astype(jnp.int32)
