"""TPU-native compute kernels for the VoFOD pipeline.

Design note (measured on TPU v5e, see DESIGN.md): random-access gather and
scatter run at ~8 ns/element (effectively serialized), while dense stencil,
elementwise and reduction passes over the full 2.5M-voxel grid cost well under
a millisecond.  Every hot-path op here is therefore formulated as dense
stencil/elementwise work plus *small* (≤ a few hundred element) compacted index
lists; the only full-size scatter kept is the 131k-point voxel binning
histogram.
"""

from vofod_tpu.ops.morphology import (
    ball_offsets,
    ball_pool_min,
    ball_pool_max,
    ball_pool_sum,
    dilate6,
    shift3,
)
from vofod_tpu.ops.compaction import masked_compact
from vofod_tpu.ops.binning import bin_points
from vofod_tpu.ops.components import propagate_reach, label_components

__all__ = [
    "ball_offsets",
    "ball_pool_min",
    "ball_pool_max",
    "ball_pool_sum",
    "dilate6",
    "shift3",
    "masked_compact",
    "bin_points",
    "propagate_reach",
    "label_components",
]
