"""Evaluation metrics.

Contracts from SURVEY.md §2.8: the family-D 8-metric eval dict
(``avenue_training_script2.py:286-295``), sklearn-style AUC/accuracy/P/R/F1
(``causal_anomaly_detection1.py:718-730``), the 95th-percentile-of-normal
threshold (``causal_anomaly_detection1.py:709-710``), and per-class score
separation reports.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from cvad_tpu.ops.adjacency import unique_graph_count


def family_d_eval_metrics(predictions: np.ndarray, causal_graphs: np.ndarray,
                          edge_threshold: float = 0.1) -> Dict[str, float]:
    """The reference's eval dict, key for key (``:286-295``)."""
    p = np.asarray(predictions).reshape(-1)
    g = np.asarray(causal_graphs)
    n_cells = g.shape[1] * g.shape[2] if g.ndim == 3 else 256
    edges = (g > edge_threshold).sum(axis=(1, 2))
    return {
        "mean_score": float(p.mean()),
        "std_score": float(p.std()),
        "min_score": float(p.min()),
        "max_score": float(p.max()),
        "score_range": float(p.max() - p.min()),
        "avg_edges": float(edges.mean()),
        "avg_sparsity": float((edges / n_cells).mean()),
        "unique_graphs": float(unique_graph_count(g)),
    }


def percentile_threshold(scores: np.ndarray, labels: np.ndarray,
                         percentile: float = 95.0) -> float:
    """Threshold at the Nth percentile of *normal* scores
    (``causal_anomaly_detection1.py:709-710``)."""
    normal = np.asarray(scores)[np.asarray(labels) == 0]
    if normal.size == 0:
        return float(np.percentile(scores, percentile))
    return float(np.percentile(normal, percentile))


def binary_metrics(scores: np.ndarray, labels: np.ndarray,
                   threshold: Optional[float] = None) -> Dict[str, float]:
    """AUC, accuracy, precision, recall, F1 at `threshold` (default 0.5, the
    reference's fixed cut; pass `percentile_threshold` output for variant B)."""
    from sklearn.metrics import (accuracy_score, f1_score, precision_score,
                                 recall_score, roc_auc_score)

    scores = np.asarray(scores).reshape(-1)
    labels = np.asarray(labels).reshape(-1).astype(int)
    thr = 0.5 if threshold is None else threshold
    preds = (scores > thr).astype(int)
    out = {
        "accuracy": float(accuracy_score(labels, preds)),
        "precision": float(precision_score(labels, preds, zero_division=0)),
        "recall": float(recall_score(labels, preds, zero_division=0)),
        "f1": float(f1_score(labels, preds, zero_division=0)),
        "threshold": float(thr),
    }
    if len(np.unique(labels)) > 1:
        out["auc"] = float(roc_auc_score(labels, scores))
    else:
        out["auc"] = float("nan")  # single-class eval, like reference NaN-scrub
    return out


def format_sample_table(scores: np.ndarray, labels: np.ndarray,
                        threshold: float = 0.5, max_rows: int = 50) -> str:
    """Per-sample prediction table (the reference's ``test_model`` print,
    ``causal_anomaly_detection.py:796-835``), returned as a string."""
    scores = np.asarray(scores).reshape(-1)
    labels = np.asarray(labels).reshape(-1)
    lines = [f"{'idx':>5} {'score':>8} {'pred':>5} {'label':>5} {'ok':>3}"]
    for i in range(min(len(scores), max_rows)):
        pred = int(scores[i] > threshold)
        ok = "y" if pred == int(labels[i]) else "n"
        lines.append(f"{i:>5} {scores[i]:>8.4f} {pred:>5} {int(labels[i]):>5} "
                     f"{ok:>3}")
    if len(scores) > max_rows:
        lines.append(f"... ({len(scores) - max_rows} more)")
    return "\n".join(lines)


def family_a_test_analysis(scores: np.ndarray, labels: np.ndarray,
                           direct_predictions: np.ndarray,
                           threshold: float = 0.5,
                           max_rows: int = 10) -> Dict[str, object]:
    """The reference family-A ``test_model`` detailed analysis
    (``causal_anomaly_detection.py:796-835``): prediction counts via BOTH
    methods (blended anomaly score > 0.5 vs argmax of the direct softmax
    head) plus the first-N per-sample rows, returned as a dict instead of
    prints."""
    scores = np.asarray(scores).reshape(-1)
    labels = np.asarray(labels).reshape(-1).astype(int)
    direct = np.asarray(direct_predictions).reshape(len(scores), -1)
    anomaly_pred = (scores > threshold).astype(int)
    class_pred = np.argmax(direct, axis=1)
    return {
        "total_samples": int(len(labels)),
        "true_normal": int((labels == 0).sum()),
        "true_abnormal": int((labels == 1).sum()),
        "score_pred_normal": int((anomaly_pred == 0).sum()),
        "score_pred_abnormal": int((anomaly_pred == 1).sum()),
        "class_pred_normal": int((class_pred == 0).sum()),
        "class_pred_abnormal": int((class_pred == 1).sum()),
        "samples": [
            {"index": i + 1, "true": int(labels[i]),
             "score": float(scores[i]),
             "anomaly_pred": int(anomaly_pred[i]),
             "class_pred": int(class_pred[i])}
            for i in range(min(max_rows, len(labels)))
        ],
    }


def score_separation(scores: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """Normal/abnormal score separation report
    (``causal_anomaly_detection1.py:486-503``)."""
    scores = np.asarray(scores).reshape(-1)
    labels = np.asarray(labels).reshape(-1)
    normal = scores[labels == 0]
    abnormal = scores[labels == 1]
    out = {
        "normal_mean": float(normal.mean()) if normal.size else float("nan"),
        "abnormal_mean": float(abnormal.mean()) if abnormal.size else float("nan"),
    }
    out["separation"] = out["abnormal_mean"] - out["normal_mean"]
    return out
