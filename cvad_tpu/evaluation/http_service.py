"""Stdlib HTTP front-end for the clip-scoring service.

The reference has no serving story at all — its inference is an in-process
one-clip-at-a-time loop (``avenue_training_script_bbox.py:328-357``).  This
module exposes :class:`~cvad_tpu.evaluation.serving.ClipScoringService`
(bucket-padded batching, one compiled program per bucket) behind a plain
HTTP endpoint, with the dynamic-batching ``BatchingServer`` coalescing
concurrent requests into single device batches.  Zero dependencies beyond
the standard library:

- ``GET  /healthz`` -> ``{"ok": true, "buckets": [...], "clip_shape": [...]}``
- ``GET  /stats``   -> batching counters (requests/clips/batches/errors,
  score seconds) — ``clips_total / batches_total`` shows coalescing
- ``POST /score``   -> scores (and graphs, when the model emits them;
  ``?graphs=0`` omits them for score-only clients)

``POST /score`` accepts either

- ``application/octet-stream``: an ``.npz`` payload (``np.savez``) with a
  ``clips`` array of shape (N, T, H, W, C), or a raw ``.npy`` array —
  float32 values in [0, 1], or uint8 raw pixels (0-255; normalized on
  device, 4x smaller payload and host->device transfer);
- ``application/json``: ``{"clips": [[...]]}`` nested lists (small
  payloads / debugging).

and returns JSON ``{"scores": [...], "graphs": [[...]] | null, "n": N}``.

Start from the CLI::

    cvad serve best_improved_model.pth --family d --port 8700
    cvad serve scorer.jaxexport --port 8700          # AOT blob, no model code
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np

from cvad_tpu.evaluation.serving import (BatchingServer, ClipScoringService,
                                         load_scorer)

_FAMILY_CLIP_SHAPES = {
    "a": (16, 240, 360, 1),
    "b": (8, 64, 64, 1),
    "c": (8, 64, 64, 1),
    "d": (8, 64, 64, 3),
    "e": (8, 64, 64, 3),
}


def service_from_path(path: str, family: str = "d",
                      buckets=(1, 8, 32, 128)) -> ClipScoringService:
    """Build a scoring service from either a torch ``.pth`` checkpoint or an
    AOT ``.jaxexport`` blob (sniffed by content, not extension).  Exported
    blobs carry their own input shape, so ``--family`` only matters for
    direct ``.pth`` serving."""
    with open(path, "rb") as f:
        head = f.read(2)
    if not head:
        raise ValueError(f"{path}: empty file is not a checkpoint or an "
                         f"exported scorer blob")
    if _is_jax_export(head):
        fn = load_scorer(open(path, "rb").read())
        return ClipScoringService(fn, buckets=buckets,
                                  clip_shape=fn.clip_shape)
    from cvad_tpu.evaluation import scoring
    from cvad_tpu.runtime import checkpoint as ckpt

    clip_shape = _FAMILY_CLIP_SHAPES[family]
    if family == "b":
        variables, memory = ckpt.import_torch_family_b(path)
        fn = scoring.make_family_b_score_fn(variables, memory)
        return ClipScoringService(lambda x: np.asarray(fn(x)).reshape(-1),
                                  buckets=buckets, clip_shape=clip_shape)
    if family == "d":
        return ClipScoringService(
            scoring.make_family_d_score_fn(ckpt.import_torch_family_d(path)),
            buckets=buckets, clip_shape=clip_shape)
    raise ValueError(f"no direct-checkpoint serving path for family "
                     f"{family!r}; run 'cvad export --family {family}' and "
                     f"serve the blob")


def _is_jax_export(head: bytes) -> bool:
    # torch .pth files are zip archives ('PK') or legacy pickles (0x80);
    # jax.export blobs are flatbuffer-framed StableHLO (neither marker)
    return not (head[:2] == b"PK" or head[:1] == b"\x80")


def _parse_clips(body: bytes, content_type: str,
                 clip_shape: Tuple[int, ...]) -> np.ndarray:
    if content_type.startswith("application/json"):
        clips = np.asarray(json.loads(body.decode())["clips"], np.float32)
    else:
        f = np.load(io.BytesIO(body), allow_pickle=False)
        raw = np.asarray(f["clips"] if hasattr(f, "files") else f)
        # uint8 payloads are raw 0-255 pixels (4x smaller on the wire AND
        # host->device; normalized on device) — preserve the dtype so the
        # batching worker keeps them on the uint8 executable
        clips = raw if raw.dtype == np.uint8 else np.asarray(raw, np.float32)
    # float clips must already be normalized: a client shipping raw 0-255
    # pixels as floats/ints (easy to do via JSON) would silently score
    # 255x-out-of-domain inputs — reject with the fix spelled out
    if clips.dtype != np.uint8 and clips.size and float(clips.max()) > 1.5:
        raise ValueError(
            f"float clips must be normalized to [0, 1] (got max "
            f"{float(clips.max()):.1f}); send raw 0-255 pixels as a uint8 "
            f"npz payload instead")
    # reject wrong shapes BEFORE they reach the shared batching worker: a
    # mismatched request co-batched with valid traffic would fail the whole
    # device batch with an opaque XLA error
    if clips.ndim != 5 or clips.shape[1:] != tuple(clip_shape):
        raise ValueError(f"clips must be (N,) + {tuple(clip_shape)}; "
                         f"got {clips.shape}")
    return clips


def _finite_or_null(arr: np.ndarray):
    """JSON-safe nested lists: non-finite values become null (json.dumps
    would otherwise emit non-RFC 'NaN'/'Infinity' literals strict parsers
    reject)."""
    a = np.asarray(arr, np.float64)
    out = a.astype(object)
    out[~np.isfinite(a)] = None
    return out.tolist()


class ScoringHTTPServer:
    """Threaded HTTP server over a :class:`BatchingServer`.

    ``port=0`` binds an ephemeral port (see ``.port``).  Concurrent POSTs
    coalesce into one device batch via the batching worker — the HTTP
    threads block on the per-request event, so N small clients cost one
    compiled-program dispatch, not N.
    """

    def __init__(self, service: ClipScoringService, host: str = "127.0.0.1",
                 port: int = 8700, max_wait_ms: float = 2.0,
                 max_body: int = 1 << 30, request_timeout: float = 300.0):
        # request_timeout must cover a cold first-bucket compile (tens of
        # seconds on TPU, minutes on a 1-core CPU host); warmup() avoids
        # paying it on live traffic
        self.service = service
        self.batcher = BatchingServer(service, max_wait_ms=max_wait_ms)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    return self._reply(
                        200, {"ok": True,
                              "buckets": list(outer.service.buckets),
                              "clip_shape": list(outer.service.clip_shape)})
                if self.path == "/stats":
                    return self._reply(200, outer.batcher.stats())
                self._reply(404, {"error": "unknown path"})

            def do_POST(self):
                from urllib.parse import parse_qs, urlsplit

                url = urlsplit(self.path)
                if url.path != "/score":
                    return self._reply(404, {"error": "unknown path"})
                # ?graphs=0 skips the adjacency matrices in the reply —
                # score-only clients save the (N, d, d) JSON serialization
                # (32k floats for a 128-clip request) and its transfer.
                # (The device-side graph computation and fetch are
                # unchanged — only the reply serialization is skipped.)
                want_graphs = parse_qs(url.query).get(
                    "graphs", ["1"])[0].lower() not in ("0", "false", "no",
                                                        "off")
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    return self._reply(400, {"error": "bad Content-Length"})
                if n <= 0 or n > max_body:
                    return self._reply(413, {"error": f"bad body size {n}"})
                try:
                    clips = _parse_clips(
                        self.rfile.read(n),
                        self.headers.get("Content-Type", ""),
                        outer.service.clip_shape)
                except Exception as e:  # noqa: BLE001 — surface to client
                    return self._reply(400, {"error": str(e)})
                try:
                    res = outer.batcher.submit(clips,
                                               timeout=request_timeout)
                except TimeoutError as e:
                    # server-side overload/cold-compile, not a client fault
                    return self._reply(503, {"error": str(e)})
                if res.error is not None:  # device batch failed
                    return self._reply(500, {"error": res.error})
                self._reply(200, {
                    "scores": _finite_or_null(res.scores),
                    "graphs": (None if res.graphs is None or not want_graphs
                               else _finite_or_null(res.graphs)),
                    "n": int(len(res.scores)),
                })

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> Tuple[str, int]:
        """Serve in a daemon thread; returns (host, port)."""
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self.host, self.port

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        self.batcher.close()
