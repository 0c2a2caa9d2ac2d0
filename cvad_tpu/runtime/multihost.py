"""Multi-host (DCN) scale-out helpers.

The reference is a single-process torch program (one ``torch.device`` global,
``causal_anomaly_detection.py:27``); this module is the framework's scale-out
contract beyond one host (SURVEY.md §2.9 collective-backend row: "DCN for
multi-host dataset sharding, ICI for gradient all-reduce"):

1. ``initialize()`` — one-call ``jax.distributed`` process bootstrap (env-var
   or explicit coordinator), idempotent and a no-op for single-process runs.
2. ``HostShardDataset`` — each host loads only its ``host_local_slice`` of a
   globally-indexed dataset; wraps any map-style dataset unchanged.
3. ``make_host_loader`` — per-host ``BatchLoader`` over that shard, with the
   per-host batch size derived from the *global* batch size.
4. ``form_global_batch`` — assemble the host-local arrays into global
   jax.Arrays sharded over the mesh's 'data' axis
   (``jax.make_array_from_process_local_data``), so the same jitted GSPMD
   train step runs unmodified on 1 host or N hosts.

Only step 4 touches devices; steps 1-3 are plain host logic, unit-tested
single-process with explicit ``process_index``/``process_count``
(tests/test_multihost.py) — real multi-host needs N hosts, which this
environment does not have.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np

from cvad_tpu.runtime.mesh import batch_sharding, host_local_slice


@dataclasses.dataclass(frozen=True)
class ProcessInfo:
    """Resolved multi-process topology after ``initialize()``."""

    process_index: int
    process_count: int
    local_devices: int
    global_devices: int

    @property
    def is_primary(self) -> bool:
        return self.process_index == 0


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> ProcessInfo:
    """Bootstrap ``jax.distributed`` for a multi-host run.

    Arguments default to the standard env vars (``CVAD_COORDINATOR`` /
    ``JAX_COORDINATOR_ADDRESS``, ``CVAD_NUM_PROCESSES``, ``CVAD_PROCESS_ID``);
    on managed TPU pods all three are auto-detected by jax and may be left
    unset.  Single-process (nothing configured, ``num_processes`` in
    (None, 1)) skips ``jax.distributed.initialize`` entirely — the call is
    safe in tests and on one host.  Idempotent: a second call returns the
    current topology without re-initializing.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "CVAD_COORDINATOR") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("CVAD_NUM_PROCESSES"):
        num_processes = int(os.environ["CVAD_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CVAD_PROCESS_ID"):
        process_id = int(os.environ["CVAD_PROCESS_ID"])

    multi = (coordinator_address is not None
             or (num_processes is not None and num_processes > 1))
    already = jax.process_count() > 1
    if multi and not already:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
    return ProcessInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=len(jax.local_devices()),
        global_devices=len(jax.devices()),
    )


class HostShardDataset:
    """View of a map-style dataset restricted to this host's global slice.

    Each host decodes only ``host_local_slice(len(dataset))`` — dataset
    sharding rides DCN-free host-local disk reads; only the assembled device
    arrays cross the network (via ICI collectives inside the jitted step).
    """

    def __init__(self, dataset, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        sl = host_local_slice(len(dataset), process_index, process_count)
        self._offset = sl.start
        self._length = sl.stop - sl.start

    def __len__(self) -> int:
        return self._length

    def __getitem__(self, idx: int):
        if not 0 <= idx < self._length:
            raise IndexError(idx)
        return self.dataset[self._offset + idx]

    def __getattr__(self, name):  # passthrough (cfg, frame lists, ...)
        # index-taking protocol methods must translate shard-local indices
        # to the inner dataset's global ones; a bare passthrough would hand
        # the inner dataset local indices — every host beyond process 0
        # would silently train on shard 0's clips (uint8 transfer path).
        # Implemented here (not as class methods) so hasattr() still
        # reflects whether the INNER dataset supports the protocol.
        if name == "get_uint8":
            inner = getattr(self.dataset, name)
            offset, length = self._offset, self._length
            def get_uint8(idx):
                if not 0 <= idx < length:
                    raise IndexError(idx)
                return inner(offset + idx)
            return get_uint8
        if name == "warm_frames":
            inner = getattr(self.dataset, name)
            offset = self._offset
            return lambda indices: inner([offset + int(i) for i in indices])
        return getattr(self.dataset, name)


def per_host_batch_size(global_batch: int,
                        process_count: Optional[int] = None,
                        process_index: Optional[int] = None) -> int:
    """This host's share of the global batch (remainder goes to host 0)."""
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    per = global_batch // pc
    if pi == 0:
        per += global_batch % pc
    return per


def make_host_loader(dataset, global_batch: int, *,
                     process_index: Optional[int] = None,
                     process_count: Optional[int] = None,
                     **loader_kwargs):
    """Per-host ``BatchLoader`` over this host's dataset shard.

    ``global_batch`` is the whole-mesh batch; each host yields its
    ``per_host_batch_size`` slice per step.  ``drop_last=True`` plus a cap at
    the FLEET-WIDE minimum step count is forced so every host yields the same
    number of steps: shard sizes differ (the dataset remainder goes to the
    last host) and local batch sizes differ (the batch remainder goes to
    host 0), so per-host ``len(shard)//bs`` alone can disagree — and one
    host running a jitted step alone deadlocks its gradient collective.
    Every host computes the same minimum from the pure slice/batch formulas.
    """
    from cvad_tpu.data.batcher import BatchLoader

    pc = jax.process_count() if process_count is None else process_count
    n = len(dataset)
    common_steps = min(
        (host_local_slice(n, i, pc).stop - host_local_slice(n, i, pc).start)
        // max(per_host_batch_size(global_batch, pc, i), 1)
        for i in range(pc))
    shard = HostShardDataset(dataset, process_index, process_count)
    local_bs = per_host_batch_size(global_batch, process_count, process_index)
    loader_kwargs.setdefault("num_threads", 4)
    loader_kwargs["drop_last"] = True
    loader_kwargs["max_batches"] = common_steps
    return BatchLoader(shard, local_bs, **loader_kwargs)


def form_global_batch(mesh, local_batch: dict):
    """Assemble host-local numpy arrays into global jax.Arrays sharded along
    the mesh's 'data' axis.

    Single-process this is exactly ``shard_batch``'s placement; multi-process
    it uses ``jax.make_array_from_process_local_data`` so each host
    contributes its slice of the global batch without any host ever
    materializing the full array.  The jitted GSPMD train step is identical
    either way.
    """
    sh = batch_sharding(mesh, None)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, x)

    return jax.tree_util.tree_map(put, local_batch)
