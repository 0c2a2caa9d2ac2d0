"""Training-history writer matching the reference's JSON contract.

The reference persists a history dict after every epoch
(``avenue_training_script2.py:380-386,459-460``) with keys ``train_losses``,
``loss_components``, ``evaluation_metrics``, ``epochs``, ``learning_rates``;
the shipped ``improved_training_history.json`` follows exactly this schema, and
the diagnosis/plot tooling (``avenue_training_script2.py:474-517``,
``avenue_training_script1.py:228-291``) consumes it.  We keep the schema so
those tool semantics carry over (SURVEY.md §5 "Metrics / logging").
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Mapping, Optional

from cvad_tpu.utils.json_utils import safe_json_load, safe_json_save


class TrainingHistory:
    """Accumulates per-epoch training records and persists them as JSON."""

    KEYS = ("train_losses", "loss_components", "evaluation_metrics", "epochs",
            "learning_rates")

    def __init__(self, path: Optional[str] = None):
        self.path = Path(path) if path else None
        self.data: Dict[str, List[Any]] = {k: [] for k in self.KEYS}

    def record_epoch(self, epoch: int, train_loss: float,
                     loss_components: Mapping[str, float], lr: float) -> None:
        self.data["epochs"].append(int(epoch))
        self.data["train_losses"].append(float(train_loss))
        self.data["loss_components"].append(
            {k: float(v) for k, v in loss_components.items()})
        self.data["learning_rates"].append(float(lr))
        self._flush()

    def record_eval(self, eval_metrics: Mapping[str, float]) -> None:
        self.data["evaluation_metrics"].append(
            {k: float(v) for k, v in eval_metrics.items()})
        self._flush()

    def _flush(self) -> None:
        if self.path is not None:
            safe_json_save(self.data, self.path, verbose=False)

    # -- persistence ---------------------------------------------------------

    @classmethod
    def load(cls, path: str) -> "TrainingHistory":
        h = cls(path)
        loaded = safe_json_load(path)
        if loaded:
            for k in cls.KEYS:
                h.data[k] = list(loaded.get(k, []))
        return h

    @property
    def last_epoch(self) -> int:
        return self.data["epochs"][-1] if self.data["epochs"] else 0

    def as_dict(self) -> Dict[str, List[Any]]:
        return self.data
