"""Serving performance measurement: latency + sustained throughput of the
HTTP scoring endpoint on the shipped family-D checkpoint.

The reference has no serving at all (its inference is an in-process
one-clip loop, ``avenue_training_script_bbox.py:328-357``); this measures
the bar item the framework adds: `cvad serve`'s stack —
``ScoringHTTPServer`` (stdlib HTTP, threaded) over ``BatchingServer``
(request coalescing) over ``ClipScoringService`` (bucket-padded jitted
forward).  Workloads:

- **single**: sequential 1-clip POSTs -> p50/p99 request latency;
- **concurrency sweep** (2/4/8 clients x 1-clip requests): sustained req/s,
  p50/p99, and the coalescing ratio (clips per device batch) from /stats;
- **bulk**: sequential 32/64/128-clip POSTs -> clips/s through the endpoint.

Each workload runs per payload dtype (default float32 AND uint8): uint8 is
the production wire format — raw pixels, 4x smaller over HTTP and
host->device, normalized on device by the per-dtype cached executable.

All requests ride real TCP loopback HTTP (http.client), .npz payloads —
the same bytes an external client sends.  Timing is end-to-end at the
client (connect + serialize + POST + score + JSON reply).

Usage: python scripts/bench_serving.py [--seconds 10] [--out runs/serving_bench.json]
Writes one JSON artifact and prints a summary table.
"""
from __future__ import annotations

import argparse
import http.client
import io
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CKPT = "/root/reference/best_improved_model.pth"
CLIP_SHAPE = (8, 64, 64, 3)


def _npz_payload(n: int, rng: np.random.Generator,
                 dtype: str = "float32") -> bytes:
    buf = io.BytesIO()
    if dtype == "uint8":  # raw pixels: 4x smaller wire + H2D transfer
        clips = rng.integers(0, 256, (n,) + CLIP_SHAPE, dtype=np.uint8)
    else:
        clips = rng.uniform(0, 1, (n,) + CLIP_SHAPE).astype(np.float32)
    np.savez(buf, clips=clips)
    return buf.getvalue()


def _post(host: str, port: int, payload: bytes, timeout: float = 300.0) -> dict:
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    try:
        conn.request("POST", "/score", body=payload,
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        body = resp.read()
        if resp.status != 200:
            raise RuntimeError(f"HTTP {resp.status}: {body[:200]!r}")
        return json.loads(body)
    finally:
        conn.close()


def _get(host: str, port: int, path: str) -> dict:
    conn = http.client.HTTPConnection(host, port, timeout=60)
    try:
        conn.request("GET", path)
        return json.loads(conn.getresponse().read())
    finally:
        conn.close()


def _percentiles(lat_ms: list) -> dict:
    a = np.asarray(lat_ms, np.float64)
    return {"p50_ms": round(float(np.percentile(a, 50)), 2),
            "p99_ms": round(float(np.percentile(a, 99)), 2),
            "mean_ms": round(float(a.mean()), 2),
            "n": int(a.size)}


def run_single(host, port, payload, n: int = 100) -> dict:
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        _post(host, port, payload)
        lat.append((time.perf_counter() - t0) * 1e3)
    return _percentiles(lat)


def run_concurrency(host, port, payload, clients: int, seconds: float) -> dict:
    stats0 = _get(host, port, "/stats")
    lat_all: list = []
    counts = [0] * clients
    stop = time.perf_counter() + seconds
    lock = threading.Lock()

    def worker(i: int):
        mine = []
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            _post(host, port, payload)
            mine.append((time.perf_counter() - t0) * 1e3)
        with lock:
            lat_all.extend(mine)
            counts[i] = len(mine)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    stats1 = _get(host, port, "/stats")
    d_clips = stats1["clips_total"] - stats0["clips_total"]
    d_batches = stats1["batches_total"] - stats0["batches_total"]
    out = _percentiles(lat_all)
    out.update({"clients": clients,
                "req_per_s": round(sum(counts) / wall, 1),
                "coalesce_clips_per_batch":
                    round(d_clips / max(d_batches, 1), 2)})
    return out


def run_bulk(host, port, rng, dtype: str, n_clips: int = 64,
             reps: int = 20) -> dict:
    payload = _npz_payload(n_clips, rng, dtype)
    t0 = time.perf_counter()
    for _ in range(reps):
        _post(host, port, payload)
    wall = time.perf_counter() - t0
    return {"clips_per_request": n_clips, "reps": reps,
            "payload_mb": round(len(payload) / 2**20, 1),
            "clips_per_s": round(n_clips * reps / wall, 1),
            "ms_per_request": round(wall / reps * 1e3, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0,
                    help="duration of each concurrency-sweep window")
    ap.add_argument("--ckpt", default=CKPT)
    ap.add_argument("--dtypes", default="float32,uint8",
                    help="comma list of client payload dtypes to measure "
                         "(uint8 = raw pixels, 4x smaller wire + H2D)")
    ap.add_argument("--buckets", default="1,8,32,128",
                    help="service batch buckets (requests pad UP to the "
                         "next bucket: a 64-clip request on the default "
                         "buckets runs the 128 executable half-empty)")
    ap.add_argument("--bulk-only", action="store_true",
                    help="skip single/concurrency sweeps (quick bulk A/B, "
                         "e.g. bucket-shape studies)")
    ap.add_argument("--out", default=str(REPO / "runs" / "serving_bench.json"))
    args = ap.parse_args()

    from cvad_tpu.evaluation.http_service import (ScoringHTTPServer,
                                                  service_from_path)

    import jax

    buckets = tuple(int(b) for b in args.buckets.split(",") if b.strip())
    service = service_from_path(args.ckpt, family="d", buckets=buckets)
    dtypes = [d.strip() for d in args.dtypes.split(",") if d.strip()]
    t0 = time.perf_counter()
    service.warmup(dtypes=dtypes)  # compile every bucket x dtype up front
    warm_s = time.perf_counter() - t0
    server = ScoringHTTPServer(service, port=0)
    host, port = server.start()
    print(f"server up on {host}:{port} (warmup {warm_s:.1f}s, "
          f"device {jax.devices()[0]})", flush=True)

    rng = np.random.default_rng(0)
    try:
        result = {"device": str(jax.devices()[0]),
                  "warmup_s": round(warm_s, 1),
                  "buckets": list(service.buckets),
                  "measured_at": time.time()}
        try:
            result["load_avg_start"] = float(
                open("/proc/loadavg").read().split()[0])
            result["contended"] = result["load_avg_start"] > 1.5
        except OSError:
            pass
        for dtype in dtypes:
            sec: dict = {}
            if not args.bulk_only:
                one = _npz_payload(1, rng, dtype)
                _post(host, port, one)  # prime connections/path
                sec["single"] = run_single(host, port, one)
                print(f"[{dtype}] single-request: {sec['single']}", flush=True)
                sec["concurrency"] = []
                for c in (2, 4, 8):
                    row = run_concurrency(host, port, one, c, args.seconds)
                    sec["concurrency"].append(row)
                    print(f"[{dtype}] concurrency {c}: {row}", flush=True)
            sec["bulk"] = []
            for n in (32, 64, 128):
                row = run_bulk(host, port, rng, dtype, n_clips=n)
                sec["bulk"].append(row)
                print(f"[{dtype}] bulk {n}-clip: {row}", flush=True)
            result[dtype] = sec
        result["stats_final"] = _get(host, port, "/stats")
    finally:
        server.close()

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(f"results -> {out}")


if __name__ == "__main__":
    main()
