"""Hot-path ops: fused losses, memory-bank search, adjacency stats.

Pure-jnp implementations by default (XLA fuses these into the surrounding
step); Pallas TPU kernels for the genuinely bandwidth-bound ones live in
`cvad_tpu.ops.pallas_kernels` with automatic fallback.
"""

from cvad_tpu.ops.losses import (  # noqa: F401
    binary_cross_entropy,
    family_a_loss,
    family_b_reconstruction_loss,
    focal_bce,
    improved_loss,
)
from cvad_tpu.ops.adjacency import adjacency_stats  # noqa: F401
