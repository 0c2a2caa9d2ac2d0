"""HBM-clip-cache epoch throughput vs split size.

Defends the PARITY claim that the cached end-to-end epoch's residual gap
to the pure device step (190k clips/s) is per-dispatch relay latency on a
small epoch, not a property of the cache: a fixed ~30-60 ms of dispatch
overhead per epoch amortizes with split size, so clips/s should rise
toward the device step as the split grows.

Usage: python scripts/bench_cache_scaling.py [--sizes 2048,4096,8192]
Appends results to runs/cache_scaling.json.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CLIP_SHAPE = (8, 64, 64, 3)


class _RandClips:
    """In-RAM uint8 clips (the cache cares about bytes, not content)."""

    def __init__(self, n: int):
        rng = np.random.default_rng(0)
        self.data = rng.integers(0, 256, (n,) + CLIP_SHAPE, dtype=np.uint8)
        self.labels = np.zeros(n, np.float32)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i].astype(np.float32) / 255.0, self.labels[i]

    def get_uint8(self, i):
        return self.data[i], self.labels[i]


def measure(n: int, batch: int = 256, k: int = 8, epochs: int = 3) -> dict:
    from cvad_tpu.config import preset
    from cvad_tpu.data.batcher import BatchLoader
    from cvad_tpu.train.engine import Trainer

    cfg = preset("family_d")
    cfg = cfg.replace(
        data=cfg.data.replace(batch_size=batch),
        train=cfg.train.replace(out_dir=f"/tmp/cvad_cache_scaling_{n}",
                                log_every=10**9, dtype="bfloat16",
                                steps_per_call=k, device_cache="on"))
    ds = _RandClips(n)
    loader = BatchLoader(ds, batch, shuffle=True, drop_last=True, seed=0,
                         transfer_dtype="uint8")
    trainer = Trainer(cfg, mesh=None)
    trainer.init_state(loader.sample_batch())
    t0 = time.perf_counter()
    trainer.train_epoch(loader, epoch=0, record=False)  # fill + compile
    warm_s = time.perf_counter() - t0
    best = 0.0
    for e in range(1, epochs + 1):
        t0 = time.perf_counter()
        trainer.train_epoch(loader, epoch=e, record=False)
        best = max(best, n / (time.perf_counter() - t0))
    row = {"n_clips": n, "batch": batch, "steps_per_call": k,
           "cache_mb": round(ds.data.nbytes / 2**20), "warm_s": round(warm_s, 1),
           "cached_epoch_cps": round(best, 1)}
    print(row, flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,8192,16384")
    ap.add_argument("--out", default=str(REPO / "runs" / "cache_scaling.json"))
    args = ap.parse_args()
    import jax

    rows = [measure(int(s)) for s in args.sizes.split(",")]
    out = {"device": str(jax.devices()[0]), "rows": rows,
           "device_step_reference_cps": "headline ~190k (bench.py)",
           "measured_at": time.time()}
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
