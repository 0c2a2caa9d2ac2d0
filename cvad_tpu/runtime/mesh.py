"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's single ``torch.device`` global
(``causal_anomaly_detection.py:27``).  Parallelism model (SURVEY.md §2.9):

- ``data`` axis: clip-batch data parallelism.  Batches are sharded along axis
  0; parameters are replicated; XLA inserts the gradient ``psum`` over ICI
  when the jitted train step closes over sharded inputs and replicated params.
- ``time`` axis: optional temporal-window sharding for long clips
  (cvad_tpu.parallel.temporal adds halo exchange for temporal convs).

Works identically on one real TPU chip, N TPU chips, or a CPU-simulated mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``), which is how the
multi-device tests run (SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Resolved mesh layout: (data, time) axis sizes."""

    data: int
    time: int = 1
    axis_names: Sequence[str] = ("data", "time")


def create_mesh(
    data_axis: int = 0,
    temporal_axis: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ('data','time') mesh.

    ``data_axis=0`` means "use all remaining devices on the data axis".
    A plain single-device run yields a trivial 1x1 mesh, so all code paths go
    through the same sharded jit — there is no separate single-device path.
    The ``CVAD_PLATFORM`` env var pins the device platform (e.g. ``cpu`` for
    the CPU-simulated mesh in tests).
    """
    import os

    platform = os.environ.get("CVAD_PLATFORM") or None
    devs = list(devices if devices is not None else jax.devices(platform))
    n = len(devs)
    t = max(1, temporal_axis)
    if n % t != 0:
        raise ValueError(f"temporal axis {t} does not divide device count {n}")
    d = data_axis if data_axis > 0 else n // t
    if d * t != n:
        raise ValueError(f"mesh {d}x{t} != {n} devices")
    grid = np.asarray(devs).reshape(d, t)
    return Mesh(grid, axis_names=("data", "time"))


def batch_sharding(mesh: Mesh, time_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for a batch array: axis 0 over 'data', optionally one axis
    over 'time' (for long-clip temporal sharding)."""
    if time_dim is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (time_dim + 1)
    spec[0] = "data"
    spec[time_dim] = "time"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state, RNG keys)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, time_dim: Optional[int] = None):
    """Device-put a host batch with the canonical batch sharding.

    This is the host->device boundary, replacing the reference's per-batch
    ``videos.to(device)`` (``avenue_training_script2.py:218-219``).  With
    `time_dim` set, leaves with enough rank (clips) shard their T axis over
    'time' as well — XLA's SPMD partitioner inserts the conv halo exchanges
    automatically; lower-rank leaves (labels) shard batch-only.
    """
    data_sh = batch_sharding(mesh, None)
    time_sh = batch_sharding(mesh, time_dim) if time_dim is not None else data_sh

    def put(x):
        sh = time_sh if (time_dim is not None and x.ndim > time_dim) else data_sh
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def host_local_slice(n_items: int, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> slice:
    """Which slice of a globally-indexed dataset this host should load.

    Multi-host (DCN) input sharding: each host decodes only its shard of the
    global batch/dataset; device placement over ICI happens per-host via
    `shard_batch`.  Single-process returns the full range.  (The reference
    is single-process; this is the scale-out input contract, SURVEY.md §2.9
    collective-backend row.)
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n_items // pc
    start = pi * per
    end = start + per if pi < pc - 1 else n_items
    return slice(start, end)


def pad_to_multiple(batch, multiple: int):
    """Pad axis 0 of every array to a multiple of the data-axis size and
    return (padded_batch, valid_count).  DP requires the global batch to be
    divisible by the mesh; the reference never needed this (single device)."""
    leaves = jax.tree_util.tree_leaves(batch)
    if not leaves:
        return batch, 0
    n = leaves[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n

    def _pad(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths, mode="edge")

    return jax.tree_util.tree_map(_pad, batch), n


def pad_with_valid(batch: dict, multiple: int) -> dict:
    """`pad_to_multiple` for train batches: pads axis 0 to a multiple of the
    data-axis size AND carries a ``"valid"`` float mask so the jitted step can
    exclude the padded rows from the loss/update (edge-mode duplicate rows
    would otherwise double-count the last clips in the gradient — the
    reference simply ran the small remainder batch on its single device)."""
    padded, n = pad_to_multiple(batch, multiple)
    total = jax.tree_util.tree_leaves(padded)[0].shape[0]
    return {**padded, "valid": (np.arange(total) < n).astype(np.float32)}
