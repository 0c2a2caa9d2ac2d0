"""L5 evaluation & visualization: metrics, anomaly scoring over videos,
plot dashboards, bbox localization, reports."""

from cvad_tpu.evaluation.metrics import (  # noqa: F401
    binary_metrics,
    family_d_eval_metrics,
    percentile_threshold,
    score_separation,
)
