"""Multi-host scale-out helpers (cvad_tpu.runtime.multihost).

Real multi-host needs N hosts; these tests exercise the host-side logic with
explicit process_index/process_count (SURVEY.md §2.9 collective-backend row)
and the device-side assembly on the single-process 8-device CPU mesh, where
``form_global_batch`` must equal ``shard_batch``.
"""

import numpy as np
import pytest

from cvad_tpu.runtime import multihost
from cvad_tpu.runtime.mesh import host_local_slice


class _ToyDataset:
    def __init__(self, n):
        self.n = n
        self.tag = "toy"

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        clip = np.full((2, 4, 4, 1), i, np.float32)
        return clip, np.float32(i % 2)


def test_initialize_single_process_noop():
    info = multihost.initialize()  # nothing configured -> no jax.distributed
    assert info.process_index == 0
    assert info.process_count == 1
    assert info.is_primary
    assert info.global_devices >= info.local_devices >= 1
    # idempotent
    assert multihost.initialize() == info


def test_host_shard_dataset_partitions_exactly():
    ds = _ToyDataset(103)
    shards = [multihost.HostShardDataset(ds, pi, 4) for pi in range(4)]
    # disjoint, ordered, and exhaustive over the global index space
    seen = []
    for s in shards:
        seen.extend(int(s[i][0][0, 0, 0, 0]) for i in range(len(s)))
    assert seen == list(range(103))
    # last host absorbs the remainder (host_local_slice contract)
    assert [len(s) for s in shards] == [25, 25, 25, 28]
    # attribute passthrough
    assert shards[0].tag == "toy"
    with pytest.raises(IndexError):
        shards[0][len(shards[0])]


def test_host_shard_translates_index_protocols():
    """Regression: `get_uint8`/`warm_frames` reached the inner dataset via
    bare attribute passthrough, handing it SHARD-LOCAL indices — every host
    beyond process 0 would silently train on shard 0's clips through the
    uint8 transfer path, and warm the wrong frames."""

    class _U8Dataset(_ToyDataset):
        def __init__(self, n):
            super().__init__(n)
            self.warmed = []

        def get_uint8(self, i):
            return np.full((2, 4, 4, 1), i, np.uint8), np.float32(i % 2)

        def warm_frames(self, indices):
            self.warmed.extend(int(i) for i in indices)

    ds = _U8Dataset(100)
    shard1 = multihost.HostShardDataset(ds, 1, 2)  # global offset 50
    clip, _ = shard1.get_uint8(0)
    assert int(clip[0, 0, 0, 0]) == 50
    with pytest.raises(IndexError):
        shard1.get_uint8(len(shard1))
    shard1.warm_frames([0, 3])
    assert ds.warmed == [50, 53]
    # the protocol stays invisible when the inner dataset lacks it
    assert not hasattr(multihost.HostShardDataset(_ToyDataset(10), 0, 2),
                       "get_uint8")
    # and the uint8 loader path end-to-end picks the right shard
    loader = multihost.make_host_loader(ds, 8, process_index=1,
                                        process_count=2, num_threads=1,
                                        transfer_dtype="uint8")
    batch = next(iter(loader))
    assert batch["clips"].dtype == np.uint8
    assert int(batch["clips"][0, 0, 0, 0, 0]) == 50


def test_host_shard_matches_host_local_slice():
    ds = _ToyDataset(64)
    for pc in (1, 2, 8):
        for pi in range(pc):
            sl = host_local_slice(64, pi, pc)
            shard = multihost.HostShardDataset(ds, pi, pc)
            assert len(shard) == sl.stop - sl.start


def test_per_host_batch_size_sums_to_global():
    for global_batch, pc in ((256, 4), (30, 4), (7, 8)):
        parts = [multihost.per_host_batch_size(global_batch, pc, pi)
                 for pi in range(pc)]
        assert sum(parts) == global_batch
        assert max(parts) - min(parts) <= global_batch % pc


def test_make_host_loader_equal_steps_across_hosts():
    ds = _ToyDataset(100)
    loaders = [multihost.make_host_loader(ds, 16, process_index=pi,
                                          process_count=2, num_threads=1)
               for pi in range(2)]
    # drop_last forced: both hosts must agree on step count or collectives hang
    counts = [sum(1 for _ in ld) for ld in loaders]
    assert counts[0] == counts[1]
    batch = next(iter(loaders[1]))
    # host 1's first clip is global index 50 (its shard offset)
    assert float(batch["clips"][0, 0, 0, 0, 0]) == 50.0


def test_form_global_batch_single_process(cpu_mesh):
    import jax

    from cvad_tpu.runtime.mesh import shard_batch

    batch = {"clips": np.arange(8 * 2 * 4 * 4 * 1, dtype=np.float32)
             .reshape(8, 2, 4, 4, 1),
             "labels": np.arange(8, dtype=np.float32)}
    out = multihost.form_global_batch(cpu_mesh, batch)
    ref = shard_batch(cpu_mesh, batch)
    for k in batch:
        assert out[k].sharding.is_equivalent_to(ref[k].sharding, out[k].ndim)
        np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
    # sharded along 'data': each device holds 1 of the 8 rows
    assert len(out["clips"].addressable_shards) == len(jax.devices("cpu"))


@pytest.mark.parametrize("n,pc,gb", [(97, 3, 9), (99, 3, 10), (100, 4, 6)])
def test_make_host_loader_uneven_shards_equal_steps(n, pc, gb):
    """Regression (self-review finding): the dataset remainder goes to the
    LAST host while the batch remainder goes to host 0, so naive
    len(shard)//bs step counts disagree (e.g. 97/3 hosts at batch 9: shards
    32/32/33, bs 3/3/3 -> 10/10/11 steps) — one host would run its gradient
    collective alone and deadlock.  All hosts must cap to the fleet minimum."""
    ds = _ToyDataset(n)
    counts = []
    for pi in range(pc):
        ld = multihost.make_host_loader(ds, gb, process_index=pi,
                                        process_count=pc, num_threads=1)
        counts.append(sum(1 for _ in ld))
        assert len(ld) == counts[-1]
    assert len(set(counts)) == 1, counts
