"""Training-history diagnosis.

Rebuilds ``avenue_training_script2.py:474-517`` (`diagnose_training_issues`)
as a function returning structured findings (the reference only printed):
loss-reduction percentage, loss-component balance, dead-evaluation and
score-collapse warnings.  Works on any history following the framework's
(= reference's) history-JSON schema.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional

import numpy as np

from cvad_tpu.utils.json_utils import safe_json_load


def diagnose_training_issues(history: Optional[Mapping] = None,
                             history_file: Optional[str] = None,
                             verbose: bool = True) -> Dict:
    """Analyze a training history; returns {metrics, warnings}."""
    if history is None:
        history = safe_json_load(history_file)
        if history is None:
            if verbose:
                print(f"history file not found or unreadable: {history_file}")
            return {"metrics": {}, "warnings": ["history unreadable"]}

    warnings: List[str] = []
    metrics: Dict[str, float] = {}

    losses = list(history.get("train_losses", []))
    if len(losses) > 10:
        initial = float(np.mean(losses[:5]))
        final = float(np.mean(losses[-5:]))
        reduction = (initial - final) / initial * 100 if initial else 0.0
        metrics["loss_reduction_pct"] = reduction
        if reduction < 10:
            warnings.append("minimal loss reduction (<10%)")

    comps = history.get("loss_components", [])
    if comps:
        latest = {k: v for k, v in comps[-1].items()
                  if isinstance(v, (int, float))}
        total = sum(abs(v) for v in latest.values())
        balance = {k: (abs(v) / total * 100 if total else 0.0)
                   for k, v in latest.items()}
        metrics["component_balance_pct"] = balance
        if balance.get("sparsity_loss", 0) > 80:
            warnings.append("sparsity loss dominates — reduce sparsity_weight")
        if balance.get("acyclicity_loss", 0) > 90:
            warnings.append("acyclicity loss dominates — reduce causal_weight")

    evals = history.get("evaluation_metrics", [])
    if evals:
        ranges = [e.get("score_range") for e in evals
                  if e.get("score_range") is not None]
        if ranges and all(r < 1e-4 for r in ranges[-3:]):
            warnings.append("score range collapsed — model outputs constant")
        means = [e.get("mean_score", 0.0) for e in evals]
        if means and all(m == 0.0 for m in means):
            warnings.append("all evaluation scores are zero — model not learning")

    if verbose:
        print("TRAINING DIAGNOSIS")
        for k, v in metrics.items():
            print(f"  {k}: {v}")
        for w in warnings:
            print(f"  WARNING: {w}")
        if not warnings:
            print("  no issues detected")
    return {"metrics": metrics, "warnings": warnings}
