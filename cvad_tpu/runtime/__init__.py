"""L1 device runtime: mesh/sharding, RNG plumbing, checkpointing, history,
metrics, profiling.

The reference's entire L1 is a single global ``torch.device``
(``causal_anomaly_detection.py:27``) — no mesh, no collectives, no resume.
Everything here is new TPU-native surface (SURVEY.md §2.9, §5).
"""

from cvad_tpu.runtime.mesh import (  # noqa: F401
    MeshSpec,
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)
from cvad_tpu.runtime.history import TrainingHistory  # noqa: F401
from cvad_tpu.runtime.metrics import MetricLogger, StepTimer  # noqa: F401
from cvad_tpu.runtime.checkpoint import CheckpointManager  # noqa: F401
