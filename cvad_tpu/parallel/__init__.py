"""Parallelism layer: data parallelism is built into the engine (mesh 'data'
axis); this package adds temporal/sequence sharding with halo exchange for
long clips (SURVEY.md §5 "Long-context / sequence parallelism": absent in the
reference — sliding windows on the host were its only long-video strategy)."""

from cvad_tpu.parallel.temporal import (  # noqa: F401
    temporal_sharded_forward,
    temporal_shards_valid,
)
