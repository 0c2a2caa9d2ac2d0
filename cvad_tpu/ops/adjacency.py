"""Batched adjacency-matrix statistics used by evaluation.

Reference: ``avenue_training_script2.py:286-295`` computes avg_edges,
avg_sparsity, unique_graphs on host numpy; the edge stats here run on device
as part of the jitted eval step, only uniqueness stays on host (it is a
hash-set operation).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def adjacency_stats(adj: jnp.ndarray, threshold: float = 0.1) -> Dict[str, jnp.ndarray]:
    """(B, N, N) -> per-batch edge counts and sparsity at `threshold`."""
    edges = (adj > threshold).sum(axis=(1, 2)).astype(jnp.float32)
    n = adj.shape[1] * adj.shape[2]
    return {"edges_per_graph": edges, "sparsity_per_graph": edges / n}


def unique_graph_count(graphs: np.ndarray) -> int:
    """Host-side unique-graph count (``:294``)."""
    flat = np.asarray(graphs).reshape(len(graphs), -1)
    return len(np.unique(flat, axis=0))
