"""Accelerator reachability + hermetic-CPU environment helpers.

A wedged PJRT relay (the axon dev tunnel here; any flaky plugin in general)
hangs jax backend DISCOVERY in every process where the plugin registered —
``jax.devices("cpu")`` included, and env overrides set after interpreter
startup don't help because the sitecustomize imports jax first and latches
``JAX_PLATFORMS``.  Measured failure modes and the two working escapes live
here so bench.py, the CLI drivers, ``__graft_entry__`` and the tests share
ONE implementation instead of drifting copies:

- :func:`probe_devices` — reachability check in a disposable subprocess with
  a hard timeout (the only safe way to ask "is the accelerator alive?").
- :func:`cpu_only_env` — environment for a subprocess that must NEVER
  register the plugin (strips the sitecustomize path, pins cpu).

This module must not import jax at module level: callers probe BEFORE
touching any backend.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import Iterable, Mapping, Optional, Tuple

_SITE_MARKER = "axon_site"  # sitecustomize dir that registers the plugin


def probe_devices(timeout_s: float) -> Tuple[str, object]:
    """``jax.devices()`` in a subprocess with a hard timeout.

    Returns ``(status, detail)``: status ``"ok"`` with the device-string
    list, ``"error"`` with the stderr tail, or ``"timeout"`` with a hint.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, json; "
             "print(json.dumps([str(d) for d in jax.devices()]))"],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0:
            return "ok", json.loads(r.stdout.strip().splitlines()[-1])
        return "error", r.stderr[-300:]
    except subprocess.TimeoutExpired:
        return "timeout", (f"backend discovery did not answer within "
                           f"{timeout_s:.0f}s (wedged relay?); CPU-only "
                           "work: PYTHONPATH= JAX_PLATFORMS=cpu")


def cpu_only_env(base: Optional[Mapping[str, str]] = None,
                 extra_pythonpath: Iterable[str] = ()) -> dict:
    """Environment for a subprocess that must never touch the accelerator:
    the plugin-registering sitecustomize is stripped from ``PYTHONPATH`` and
    jax/framework platform knobs are pinned to cpu."""
    env = dict(base if base is not None else os.environ)
    kept = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and _SITE_MARKER not in p]
    env["PYTHONPATH"] = os.pathsep.join([*extra_pythonpath, *kept])
    env["JAX_PLATFORMS"] = "cpu"
    env["CVAD_PLATFORM"] = "cpu"
    return env
