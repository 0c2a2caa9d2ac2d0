"""L3 models: the five reference model families as flax.linen modules.

Framework-native tensor layout is **channels-last** ``(B, T, H, W, C)`` —
the TPU/XLA-preferred layout — instead of the reference's torch
``(B, C, T, H, W)``.  `cvad_tpu.models.layers.from_torch_layout` converts.

Families (SURVEY.md §2):
  A `CausalPipelineDetector`   12-stage causal pipeline, masked redesign
  B `MemoryVideoAutoEncoder`   conv AE + LSTM + functional memory bank
  C `Simple3DCNNDetector`      minimal stable 3D-CNN classifier
  D `CausalAnomalyDetector`    flagship Avenue model (checkpoint parity anchor)
  E `BBoxVizDetector`          bbox-visualization stand-in model
"""

from cvad_tpu.models.family_d import CausalAnomalyDetector  # noqa: F401
from cvad_tpu.models.family_c import Simple3DCNNDetector  # noqa: F401
from cvad_tpu.models.family_b import MemoryVideoAutoEncoder, MemoryBankState  # noqa: F401
from cvad_tpu.models.family_a import CausalPipelineDetector  # noqa: F401
from cvad_tpu.models.family_e import BBoxVizDetector  # noqa: F401
from cvad_tpu.models.registry import build_model, MODEL_REGISTRY  # noqa: F401
