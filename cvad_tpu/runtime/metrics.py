"""Structured metric stream + step timing.

Replaces the reference's emoji ``print()`` logging (SURVEY.md §5) with a JSONL
metric stream that tooling can consume, while keeping human-readable console
output.  Also provides the wall-clock/ETA accounting the reference did inline
(``avenue_training_script1.py:209-213``).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

from cvad_tpu.utils.json_utils import convert_to_json_serializable


class MetricLogger:
    """Append-only JSONL metric writer with optional console echo."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = Path(path) if path else None
        self.echo = echo
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
        self._t0 = time.time()

    def log(self, kind: str, **fields: Any) -> Dict[str, Any]:
        rec = {"t": round(time.time() - self._t0, 3), "kind": kind}
        rec.update(convert_to_json_serializable(dict(fields)))
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.echo:
            body = " ".join(
                f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items() if k not in ("t", "kind"))
            print(f"[{rec['t']:9.2f}s] {kind}: {body}")
        return rec


class StepTimer:
    """Per-step timing with ETA, mirroring the reference's epoch-timing prints."""

    def __init__(self, total_steps: int = 0):
        self.total_steps = total_steps
        self.count = 0
        self.started = time.time()
        self._last = self.started

    def tick(self) -> Dict[str, float]:
        now = time.time()
        dt = now - self._last
        self._last = now
        self.count += 1
        elapsed = now - self.started
        rate = self.count / elapsed if elapsed > 0 else 0.0
        eta = (self.total_steps - self.count) / rate if rate > 0 and self.total_steps else 0.0
        return {"step_time_s": dt, "elapsed_s": elapsed, "steps_per_s": rate,
                "eta_s": eta}


def profile_trace(log_dir: str):
    """Context manager capturing a ``jax.profiler`` trace (SURVEY.md §5 tracing:
    the reference has wall-clock timing only; this is the TPU-native profiler)."""
    import jax

    return jax.profiler.trace(log_dir)
