"""Shared utilities: JSON serialization, training diagnosis."""

from cvad_tpu.utils.json_utils import (  # noqa: F401
    convert_to_json_serializable,
    safe_json_load,
    safe_json_save,
)
