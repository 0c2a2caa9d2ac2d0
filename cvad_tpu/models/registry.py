"""Model registry: the five reference scripts' models become interchangeable
configs of one framework (SURVEY.md §7c — one clip-in/score-out interface)."""

from __future__ import annotations

from typing import Any

from cvad_tpu.config import (
    FamilyAConfig,
    FamilyBConfig,
    FamilyCConfig,
    FamilyDConfig,
    FamilyEConfig,
)

MODEL_REGISTRY = {}


def _register(name, cfg_cls, builder):
    MODEL_REGISTRY[name] = (cfg_cls, builder)


def build_model(cfg: Any):
    """Instantiate the flax module for a model config."""
    from cvad_tpu.models.family_a import CausalPipelineDetector
    from cvad_tpu.models.family_b import MemoryVideoAutoEncoder
    from cvad_tpu.models.family_c import Simple3DCNNDetector
    from cvad_tpu.models.family_d import CausalAnomalyDetector
    from cvad_tpu.models.family_e import BBoxVizDetector

    table = {
        FamilyAConfig: CausalPipelineDetector,
        FamilyBConfig: MemoryVideoAutoEncoder,
        FamilyCConfig: Simple3DCNNDetector,
        FamilyDConfig: CausalAnomalyDetector,
        FamilyEConfig: BBoxVizDetector,
    }
    cls = table.get(type(cfg))
    if cls is None:
        raise KeyError(f"no model registered for config {type(cfg).__name__}")
    return cls(cfg)
