"""Host decode-path benchmark: native C++ core vs PIL/cv2.

The reference's true input bottleneck is per-frame ``cv2.imread`` /
``PIL.Image.open`` inside ``__getitem__`` (SURVEY.md §2 native-component
note; ``minicausal_vad_complete3.py:141-143``, ``avenue_training_script_bbox.py
:397-411``).  This measures the replacement paths on realistic trees:

- UCSD Ped2-style: grayscale .tif frames at 240x360, decoded+resized to 64x64
- Avenue-style: RGB .jpg frames at 360x640 -> 64x64

Usage: python scripts/bench_decode.py [--frames 96] [--out-hw 64]
Prints one JSON line per (tree, backend): frames/s decode+resize throughput.
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np


def _write_tree(root: Path, fmt: str, hw, channels: int, frames: int) -> list:
    from PIL import Image

    rng = np.random.default_rng(0)
    h, w = hw
    vdir = root / "Train" / "Train001"
    vdir.mkdir(parents=True)
    paths = []
    # smooth-ish content so JPEG sizes are realistic
    base = rng.normal(0.5, 0.1, (h, w)).astype(np.float32)
    for i in range(frames):
        img = np.clip(base + 0.2 * np.sin(i / 3.0), 0, 1)
        arr = (img * 255).astype(np.uint8)
        if channels == 3:
            arr = np.stack([arr, arr // 2 + 64, 255 - arr], axis=-1)
        p = vdir / f"{i + 1:03d}.{fmt}"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def _bench(fn, paths, repeat: int) -> float:
    # warm once (page cache, library init)
    fn(paths[: min(8, len(paths))])
    t0 = time.perf_counter()
    n = 0
    for _ in range(repeat):
        fn(paths)
        n += len(paths)
    return n / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--out-hw", type=int, default=64)
    ap.add_argument("--threads", type=int, default=1)
    args = ap.parse_args()

    from cvad_tpu.data import decode
    from cvad_tpu.data.native_decoder import (decode_clip, load_library,
                                              supported_suffixes)

    out_hw = (args.out_hw, args.out_hw)
    trees = [("ucsd_tif", "tif", (240, 360), 1),
             ("avenue_jpg", "jpg", (360, 640), 3)]
    have = supported_suffixes() if load_library() is not None else ()

    for name, fmt, hw, c in trees:
        tmp = Path(tempfile.mkdtemp(prefix=f"bench_decode_{name}_"))
        try:
            paths = _write_tree(tmp, fmt, hw, c, args.frames)

            def native_clip(ps):
                out = decode_clip(ps, out_hw, c, nthreads=args.threads)
                assert out is not None and out.shape[0] == len(ps)

            def frame_backend(backend):
                def run(ps):
                    for p in ps:
                        arr = decode.decode_frame(p, out_hw, grayscale=c == 1,
                                                  backend=backend)
                        assert arr.std() > 0  # decoded, not zero fallback
                return run

            rows = {}
            if f".{fmt}" in have:
                rows["native_clip"] = _bench(native_clip, paths, args.repeat)
                rows["native_frame"] = _bench(frame_backend("native"), paths,
                                              args.repeat)
            rows["pil"] = _bench(frame_backend("pil"), paths, args.repeat)
            if decode._cv2() is not None:
                rows["cv2"] = _bench(frame_backend("cv2"), paths, args.repeat)
            best_lib = max(rows.get("pil", 0.0), rows.get("cv2", 0.0))
            for backend, fps in rows.items():
                print(json.dumps({
                    "tree": name, "backend": backend,
                    "frames_per_s": round(fps, 1),
                    "vs_best_library": round(fps / best_lib, 2),
                }))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
