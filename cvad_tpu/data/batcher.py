"""Batching + prefetching device feed.

TPU-native replacement for the reference's ``DataLoader(num_workers=2)``
(SURVEY.md §2.9 "Async/parallel input pipeline"): a thread-pool decode/collate
stage feeding a bounded queue, then a device-put double buffer so the next
batch's host->device transfer overlaps the current step's compute.  The
device boundary is one `jax.device_put` with the mesh's batch sharding —
replacing per-batch ``.to(device)`` calls.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterable, Iterator, Optional

import numpy as np


class BatchLoader:
    """Iterable over collated host batches ``{"clips": (B,T,H,W,C), "labels": (B,)}``.

    Decode happens in a small thread pool (PIL/cv2/native decode release the
    GIL); batches come out in deterministic order.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 torch_layout: bool = False, num_threads: int = 4,
                 prefetch: int = 2, transfer_dtype: str = "float32",
                 max_batches: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # 0 = no cap; multi-host training caps every host to the fleet-wide
        # minimum step count so no host runs a collective alone
        self.max_batches = max_batches
        self.seed = seed
        self.torch_layout = torch_layout
        self.num_threads = max(1, num_threads)
        self.prefetch = max(1, prefetch)
        # uint8 transfer: 4x fewer host->device bytes; jitted steps normalize
        # on device (cvad_tpu.train.tasks.prep_clips)
        self.transfer_dtype = transfer_dtype
        self._epoch = 0
        self._executor = None

    def _pool(self):
        if self._executor is None:
            from concurrent.futures import ThreadPoolExecutor

            self._executor = ThreadPoolExecutor(max_workers=self.num_threads)
        return self._executor

    def __len__(self) -> int:
        n = len(self.dataset)
        k = (n // self.batch_size if self.drop_last
             else (n + self.batch_size - 1) // self.batch_size)
        return min(k, self.max_batches) if self.max_batches else k

    def _batch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        if self.max_batches:
            stop = min(stop, self.max_batches * self.batch_size)
        for s in range(0, stop, self.batch_size):
            yield idx[s:s + self.batch_size]

    def _collate(self, indices) -> Dict[str, np.ndarray]:
        if hasattr(self.dataset, "warm_frames"):
            # one threaded native decode of ALL the batch's missing frames —
            # overlapping clip windows in the batch share frames, and the
            # per-item pool below would decode each shared frame once per
            # window (racing threads can't see each other's cache fills)
            self.dataset.warm_frames([int(i) for i in indices])
        use_u8 = (self.transfer_dtype == "uint8"
                  and hasattr(self.dataset, "get_uint8"))
        get = self.dataset.get_uint8 if use_u8 else self.dataset.__getitem__
        if self.num_threads > 1 and len(indices) > 1:
            # decode items in parallel (native/PIL decode releases the GIL)
            items = list(self._pool().map(lambda i: get(int(i)), indices))
        else:
            items = [get(int(i)) for i in indices]
        clips = np.stack([c for c, _ in items])
        labels = np.asarray([l for _, l in items], np.float32)
        if self.torch_layout:  # (B, T, H, W, C) -> (B, C, T, H, W)
            clips = np.transpose(clips, (0, 4, 1, 2, 3))
        return {"clips": clips, "labels": labels}

    def sample_batch(self) -> Dict[str, np.ndarray]:
        """First batch in dataset order WITHOUT starting an epoch: no
        producer thread to strand, no shuffle-epoch increment — for
        model/state initialization (engine ``fit``)."""
        n = min(self.batch_size, len(self.dataset))
        return self._collate(np.arange(n))

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch: the NEXT iteration uses ``seed + epoch``'s
        permutation.  The trainer ties shuffle order to the global training
        epoch so a resumed run replays the interrupted run's batch order
        exactly (torch ``DistributedSampler.set_epoch`` analog)."""
        self._epoch = epoch - 1

    def epoch_index_batches(self, epoch: int):
        """Batch index lists for `epoch`, advancing the shuffle epoch exactly
        as iterating would — the device-resident clip cache path
        (`cvad_tpu.data.device_cache`) feeds clips from HBM and only needs
        the host-side batch composition."""
        self.set_epoch(epoch)
        self._epoch += 1
        return list(self._batch_indices())

    def iter_from(self, skip: int) -> Iterator[Dict[str, np.ndarray]]:
        """This epoch's iterator starting at batch index ``skip`` — identical
        shuffle, skipped batches never decoded (mid-epoch resume)."""
        return self._iter(skip)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self._iter(0)

    def _iter(self, skip: int) -> Iterator[Dict[str, np.ndarray]]:
        self._epoch += 1
        batches = list(self._batch_indices())[skip:]
        if not batches:
            return iter(())
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []
        cancel = threading.Event()  # set when the consumer abandons the epoch

        def _put(item) -> bool:
            # bounded-queue put that gives up once cancelled, so an abandoned
            # iterator can never strand its producer thread on q.put forever
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in batches:
                    if not _put(self._collate(b)):
                        return  # consumer gone: stop decoding
            except BaseException as e:  # surface to the consumer: a silently
                err.append(e)           # truncated epoch would corrupt
            finally:                    # metrics/schedule/checkpoints
                _put(sentinel)

        def gen():
            # start the producer HERE, not in _iter: a generator that is
            # created but never advanced never runs its finally (close() is
            # a no-op on an unstarted generator), so a thread started
            # eagerly could never be cancelled
            threading.Thread(target=producer, daemon=True).start()
            try:
                while True:
                    item = q.get()
                    if item is sentinel:
                        if err:
                            raise RuntimeError(
                                "BatchLoader producer failed mid-epoch"
                            ) from err[0]
                        break
                    yield item
            finally:
                cancel.set()  # normal end OR abandoned mid-epoch (gen.close)

        return gen()


class DevicePrefetcher:
    """Wrap a host-batch iterable: device-put batch k+1 while batch k computes.

    With a mesh, batches land pre-sharded over the 'data' axis (the multi-chip
    input path); without one, a plain async device transfer.
    """

    def __init__(self, host_batches: Iterable[Dict[str, np.ndarray]],
                 mesh=None, pad_to_multiple: Optional[int] = None,
                 put_fn=None, time_dim: Optional[int] = None):
        self.host_batches = host_batches
        self.mesh = mesh
        self.pad = pad_to_multiple
        self.put_fn = put_fn
        self.time_dim = time_dim

    def _put(self, batch: Dict[str, np.ndarray]):
        import jax

        if self.put_fn is not None:
            return self.put_fn(batch)
        if self.pad:
            from cvad_tpu.runtime.mesh import pad_with_valid as _pad

            batch = _pad(batch, self.pad)  # carries the "valid" loss mask
        if self.mesh is not None:
            from cvad_tpu.runtime.mesh import shard_batch

            return shard_batch(self.mesh, batch, time_dim=self.time_dim)
        return jax.tree_util.tree_map(jax.device_put, batch)

    def __iter__(self):
        it = iter(self.host_batches)
        try:
            pending = self._put(next(it))
        except StopIteration:
            return
        for nxt in it:
            nxt_dev = self._put(nxt)  # enqueue transfer before yielding current
            yield pending
            pending = nxt_dev
        yield pending
