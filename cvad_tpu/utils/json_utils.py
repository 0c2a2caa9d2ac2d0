"""numpy/JAX -> JSON serialization utilities.

Capability parity with the reference's ``json_utils.py:5-63`` (and its inline
duplicate at ``avenue_training_script2.py:303-333``), extended to cover JAX
arrays, dataclasses, and Path objects, since framework state now includes
device arrays.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import numpy as np

try:  # jax arrays serialize like numpy; keep this module importable without jax
    import jax
    _JAX_ARRAY: Optional[type] = jax.Array
except Exception:  # pragma: no cover
    _JAX_ARRAY = None


def convert_to_json_serializable(obj: Any) -> Any:
    """Recursively convert numpy/JAX scalars and arrays to Python natives."""
    if _JAX_ARRAY is not None and isinstance(obj, _JAX_ARRAY):
        obj = np.asarray(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, np.bool_):
        return bool(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return convert_to_json_serializable(dataclasses.asdict(obj))
    if isinstance(obj, dict):
        return {str(k): convert_to_json_serializable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [convert_to_json_serializable(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    return obj


def safe_json_save(data: Any, filepath, verbose: bool = True) -> bool:
    """Serialize ``data`` to JSON at ``filepath``, creating parent dirs.

    Returns True on success (reference contract: ``json_utils.py:22-42``).
    """
    try:
        filepath = Path(filepath)
        filepath.parent.mkdir(parents=True, exist_ok=True)
        with open(filepath, "w") as f:
            json.dump(convert_to_json_serializable(data), f, indent=2)
        if verbose:
            print(f"saved JSON: {filepath}")
        return True
    except Exception as e:  # noqa: BLE001 — contract is bool, not raise
        if verbose:
            print(f"failed to save JSON {filepath}: {e}")
        return False


def safe_json_load(filepath, default: Any = None) -> Any:
    """Load JSON, returning ``default`` on any failure
    (reference contract: ``json_utils.py:45-63``)."""
    try:
        with open(filepath, "r") as f:
            return json.load(f)
    except Exception:  # noqa: BLE001
        return default
