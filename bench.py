"""Headline benchmark: family-D training throughput (clips/sec) on one chip.

Prints ONE JSON line:
  {"metric": "train_clips_per_sec", "value": N, "unit": "clips/s",
   "vs_baseline": R}

Baseline: the reference PyTorch implementation's full train step (forward +
5-term loss + backward + AdamW step, ``avenue_training_script2.py:207-263``)
measured on this host's CPU — the only reference-capable hardware available
(the reference records no throughput numbers and its GPU is unnamed;
BASELINE.md).  The baseline measurement is cached in ``.bench_baseline.json``.

Extra context lines go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

BATCH = 64
CLIP_SHAPE = (8, 64, 64, 3)  # T, H, W, C
WARMUP = 3
ITERS = 20
BASELINE_CACHE = Path(__file__).parent / ".bench_baseline.json"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_framework() -> float:
    import jax

    from cvad_tpu.config import preset
    from cvad_tpu.runtime.mesh import create_mesh, shard_batch
    from cvad_tpu.train.engine import Trainer

    cfg = preset("family_d")
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=BATCH),
        train=cfg.train.replace(out_dir="/tmp/cvad_bench", log_every=10**9),
    )
    mesh = create_mesh()
    trainer = Trainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    batch = {
        "clips": rng.uniform(0, 1, (BATCH,) + CLIP_SHAPE).astype(np.float32),
        "labels": np.zeros(BATCH, np.float32),
    }
    trainer.init_state(batch)
    sharded = shard_batch(mesh, batch)

    for _ in range(WARMUP):
        trainer.state, metrics = trainer._jit_train(trainer.state, sharded,
                                                    trainer._rng)
    jax.block_until_ready(trainer.state.params)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        trainer.state, metrics = trainer._jit_train(trainer.state, sharded,
                                                    trainer._rng)
    jax.block_until_ready(trainer.state.params)
    dt = time.perf_counter() - t0
    cps = BATCH * ITERS / dt
    log(f"framework: {ITERS} steps of {BATCH} clips in {dt:.3f}s "
        f"-> {cps:.1f} clips/s on {jax.devices()[0]}")
    return cps


def measure_reference_baseline() -> float:
    """Torch reference train-step throughput on host CPU (cached)."""
    if BASELINE_CACHE.exists():
        cached = json.loads(BASELINE_CACHE.read_text())
        log(f"baseline (cached): {cached['clips_per_sec']:.2f} clips/s")
        return cached["clips_per_sec"]
    import importlib.util

    import torch

    ref_path = "/root/reference/avenue_training_script2.py"
    if not Path(ref_path).exists():
        log("reference not available; baseline = nan")
        return float("nan")
    # torch>=2.x removed ReduceLROnPlateau's `verbose` kwarg, which the
    # reference passes (:129); shim it so the reference runs unmodified
    import torch.optim.lr_scheduler as lrs

    if "verbose" not in lrs.ReduceLROnPlateau.__init__.__code__.co_varnames:
        _orig_init = lrs.ReduceLROnPlateau.__init__

        def _patched(self, *a, verbose=False, **k):
            _orig_init(self, *a, **k)

        lrs.ReduceLROnPlateau.__init__ = _patched

    spec = importlib.util.spec_from_file_location("ref_avenue2", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    trainer = ref.ImprovedMiniCausalVAD(device="cpu")
    b = 8  # reference used batch 4; CPU-feasible batch for timing
    x = torch.rand(b, 3, CLIP_SHAPE[0], CLIP_SHAPE[1], CLIP_SHAPE[2])
    y = torch.zeros(b)

    def step():
        trainer.optimizer.zero_grad()
        scores, adj, feats = trainer.model(x)
        loss, _ = trainer.compute_improved_loss(scores, adj, y, feats)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(trainer.model.parameters(), 0.5)
        trainer.optimizer.step()

    for _ in range(2):
        step()
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    cps = b * n / dt
    BASELINE_CACHE.write_text(json.dumps(
        {"clips_per_sec": cps, "batch": b, "iters": n, "seconds": dt,
         "hardware": "host CPU (torch)", "measured_at": time.time()}))
    log(f"baseline (torch cpu): {n} steps of {b} clips in {dt:.3f}s "
        f"-> {cps:.2f} clips/s")
    return cps


def main() -> None:
    import contextlib

    value = measure_framework()
    try:
        # the reference prints banners at construction; keep stdout pure JSON
        with contextlib.redirect_stdout(sys.stderr):
            baseline = measure_reference_baseline()
    except Exception as e:  # baseline failure must not kill the bench
        log(f"baseline measurement failed: {e}")
        baseline = float("nan")
    vs = value / baseline if baseline and np.isfinite(baseline) else float("nan")
    print(json.dumps({
        "metric": "train_clips_per_sec",
        "value": round(value, 2),
        "unit": "clips/s",
        "vs_baseline": round(vs, 2) if np.isfinite(vs) else None,
    }))


if __name__ == "__main__":
    main()
