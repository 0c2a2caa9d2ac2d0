"""Train state pytree: parameters + BN stats + optimizer state + step +
model-specific extra state (e.g. the family-B memory bank).

The reference's train "state" is scattered across a torch module's mutable
buffers, an optimizer object, and Python locals; here it is one explicit
pytree threaded through a donated jitted step, which is what makes
checkpoint/resume and data-parallel replication trivial.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    batch_stats: Any = None
    extra: Any = None  # family B: MemoryBankState

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def float_metrics(metrics: dict) -> dict:
    """Device metrics dict -> host floats (one transfer point per step)."""
    import numpy as np

    return {k: float(np.asarray(v)) for k, v in metrics.items()}


def param_count(params: Any) -> int:
    import jax

    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def make_state(params: Any, tx, batch_stats: Any = None, extra: Any = None
               ) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        batch_stats=batch_stats,
        extra=extra,
    )


def finite_or_skip(new_state: TrainState, old_state: TrainState,
                   loss: jnp.ndarray) -> TrainState:
    """NaN guard: keep the old state when the loss is non-finite — the
    functional analog of the reference's skip-batch-on-NaN
    (``avenue_training_script2.py:230-232``, ``minicausal_vad_complete3.py:282``)."""
    import jax

    ok = jnp.isfinite(loss)
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o) if hasattr(n, "dtype") else n,
        new_state, old_state)
