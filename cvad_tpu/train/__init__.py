"""L4 training engine: optimizers/schedules, jitted train+eval steps per
model family, and the epoch-loop engine with history/checkpoint/eval cadence.

Reference counterparts: the five per-script training loops of SURVEY.md §2.7,
unified into one engine over per-family step definitions.
"""

from cvad_tpu.train.state import TrainState  # noqa: F401
from cvad_tpu.train.optim import build_optimizer, HostScheduler  # noqa: F401
from cvad_tpu.train.tasks import build_task  # noqa: F401
from cvad_tpu.train.engine import Trainer  # noqa: F401
