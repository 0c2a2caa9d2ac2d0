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


def debug_dataset_dtypes(dataset, num_samples: int = 3,
                         verbose: bool = True) -> List[Dict]:
    """Dataset dtype audit (``minicausal_vad_complete3.py:435-456``):
    loads N samples, records shape/dtype/range, flags float64 leakage.
    Returns one dict per sample instead of only printing."""
    out: List[Dict] = []
    for i in range(min(num_samples, len(dataset))):
        try:
            data, label = dataset[i]
            data = np.asarray(data)
            rec = {"index": i, "shape": tuple(data.shape),
                   "dtype": str(data.dtype),
                   "min": float(data.min()), "max": float(data.max()),
                   "float64": data.dtype == np.float64
                   or getattr(label, "dtype", None) == np.float64}
            if verbose:
                flag = "  WARNING: float64 leakage" if rec["float64"] else ""
                print(f"sample {i}: {rec['shape']} {rec['dtype']} "
                      f"[{rec['min']:.6f}, {rec['max']:.6f}]{flag}")
        except Exception as e:  # the reference printed and continued
            rec = {"index": i, "error": str(e)}
            if verbose:
                print(f"sample {i}: load error: {e}")
        out.append(rec)
    return out


def smoke_test_model(verbose: bool = True) -> Dict:
    """Pre-training model smoke test (``minicausal_vad_complete3.py:458-501``,
    the reference's family-C gate): audit parameter dtypes (all float32),
    run a random ``(2, 8, 64, 64, 1)`` forward, check output shape / [0,1]
    range / NaN / Inf.  Returns {ok, param_dtype_issues, output_*}."""
    import jax
    import jax.numpy as jnp

    from cvad_tpu.models.family_c import Simple3DCNNDetector

    model = Simple3DCNNDetector()
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 8, 64, 64, 1)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    issues = [jax.tree_util.keystr(path)
              for path, leaf in jax.tree_util.tree_flatten_with_path(
                  v["params"])[0]
              if leaf.dtype != jnp.float32]
    s = np.asarray(model.apply(v, x))
    result = {
        "ok": (not issues and s.shape == (2, 1)
               and bool(np.all((s >= 0) & (s <= 1)))
               and bool(np.all(np.isfinite(s)))),
        "param_dtype_issues": issues,
        "output_shape": tuple(s.shape),
        "output_range": (float(s.min()), float(s.max())),
        "has_nan": bool(np.isnan(s).any()),
        "has_inf": bool(np.isinf(s).any()),
    }
    if verbose:
        status = "passed" if result["ok"] else "FAILED"
        print(f"model smoke test {status}: output {result['output_shape']} "
              f"range [{result['output_range'][0]:.6f}, "
              f"{result['output_range'][1]:.6f}]")
        for name in issues:
            print(f"  WARNING: non-float32 param {name}")
    return result
