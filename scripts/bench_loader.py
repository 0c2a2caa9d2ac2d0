"""End-to-end host input-pipeline benchmark (no device step).

Measures clips/s through the real path the Trainer consumes:
frame tree on disk -> ClipDataset (native C++ decode, uint8 clip cache)
-> BatchLoader (threaded collate).  Round-1 VERDICT flagged the epoch
path as host-decode-bound (573 clips/s); this isolates the host side so
decode/cache wins are visible without the TPU.

Usage: python scripts/bench_loader.py [--videos 4] [--frames 120]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time
from pathlib import Path


def _epoch_clips_per_s(loader) -> tuple:
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += len(batch["labels"])
    return n, n / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--fmt", default="tif")
    ap.add_argument("--hw", type=int, nargs=2, default=(240, 360),
                    metavar=("H", "W"))
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from cvad_tpu.config import DataConfig
    from cvad_tpu.data.batcher import BatchLoader
    from cvad_tpu.data.datasets import UCSDPed2Dataset
    from cvad_tpu.data.synthetic import write_synthetic_video_tree

    tmp = Path(tempfile.mkdtemp(prefix="bench_loader_"))
    try:
        write_synthetic_video_tree(str(tmp), splits=("Train",),
                                   videos_per_split=args.videos,
                                   frames_per_video=args.frames,
                                   hw=tuple(args.hw), channels=1,
                                   fmt=args.fmt)
        for cache, tdtype in ((False, "float32"), (True, "float32"),
                              (True, "uint8")):
            cfg = DataConfig(root=str(tmp), clip_len=8, stride=4,
                             frame_size=(64, 64), channels=1,
                             cache_decoded=cache)
            ds = UCSDPed2Dataset(str(tmp), "Train", cfg)
            loader = BatchLoader(ds, args.batch, num_threads=4,
                                 transfer_dtype=tdtype)
            for epoch in (1, 2):
                n, cps = _epoch_clips_per_s(loader)
                print(json.dumps({
                    "cache_decoded": cache, "transfer_dtype": tdtype,
                    "epoch": epoch, "clips": n,
                    "clips_per_s": round(cps, 1),
                    "frames_per_s": round(cps * cfg.clip_len, 1),
                }))
                if not cache:
                    break  # epoch 2 is identical without the cache
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
