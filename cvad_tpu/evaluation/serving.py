"""Clip-scoring service: the production-serving path.

The reference has no serving story (its inference is the one-clip-at-a-time
loop in ``avenue_training_script_bbox.py:328-357``).  `ClipScoringService`
serves any registered model from framework or torch checkpoints with the
TPU-friendly shape discipline:

- requests are padded to a small set of fixed batch-size buckets so XLA
  compiles a handful of programs once, then every request hits a cached
  executable (no recompiles for ragged request sizes);
- an optional background thread drains a request queue with dynamic batching
  (coalesces concurrent small requests up to the largest bucket);
- throughput path is the same jitted forward the benchmark measures.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_BUCKETS = (1, 8, 32, 128)


@dataclass
class ScoreResult:
    scores: np.ndarray
    graphs: Optional[np.ndarray] = None
    # set when the device batch failed: scores is empty and the caller
    # should surface the failure instead of treating it as a result
    error: Optional[str] = None


class ClipScoringService:
    """Batched, bucket-padded scoring over a jitted model forward."""

    def __init__(self, score_fn: Callable[[np.ndarray], Tuple[np.ndarray, ...]],
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 clip_shape: Tuple[int, ...] = (8, 64, 64, 3)):
        self.score_fn = score_fn
        self.buckets = tuple(sorted(buckets))
        self.clip_shape = tuple(clip_shape)  # for warmup; B/C serve (…, 1)
        self._lock = threading.Lock()

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw) -> "ClipScoringService":
        """Serve the flagship family-D model directly from a reference
        .pth checkpoint (e.g. the shipped ``best_improved_model.pth``)."""
        from cvad_tpu.evaluation.scoring import make_family_d_score_fn
        from cvad_tpu.runtime.checkpoint import import_torch_family_d

        return cls(make_family_d_score_fn(import_torch_family_d(path)), **kw)

    @classmethod
    def from_exported(cls, blob: bytes, **kw) -> "ClipScoringService":
        """Serve an ahead-of-time :func:`export_scorer` artifact — no model
        code or checkpoint import on the serving host."""
        return cls(load_scorer(blob), **kw)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def score(self, clips: np.ndarray) -> ScoreResult:
        """Score (N, T, H, W, C) clips; N may be anything — requests larger
        than the biggest bucket are chunked, empty requests return empty."""
        n = len(clips)
        if n == 0:
            return ScoreResult(scores=np.zeros(0, np.float32))
        big = self.buckets[-1]
        if n > big:
            parts = [self.score(clips[s:s + big]) for s in range(0, n, big)]
            return ScoreResult(
                scores=np.concatenate([p.scores for p in parts]),
                graphs=(np.concatenate([p.graphs for p in parts])
                        if parts[0].graphs is not None else None))
        b = self._bucket(n)
        padded = clips
        if b != n:
            pad = np.repeat(clips[-1:], b - n, axis=0)
            padded = np.concatenate([clips, pad])
        with self._lock:  # one in-flight device call; queue serializes others
            out = self.score_fn(padded)
        if isinstance(out, tuple):
            scores = np.asarray(out[0]).reshape(-1)
            graphs = None if out[1] is None else np.asarray(out[1])[:n]
            return ScoreResult(scores[:n], graphs)
        return ScoreResult(np.asarray(out).reshape(-1)[:n])

    def warmup(self, dtypes: Sequence[str] = ("float32",)) -> None:
        """Compile every bucket once per serving dtype (cold-start
        elimination).  Pass ``("float32", "uint8")`` when clients will send
        raw-pixel uint8 payloads (4x smaller wire + host->device transfer,
        normalized on device)."""
        for dt in dtypes:
            for b in self.buckets:
                self.score(np.zeros((b,) + self.clip_shape, dt))


@dataclass
class _Pending:
    clips: np.ndarray
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[ScoreResult] = None


class BatchingServer:
    """Dynamic batching front-end: concurrent `submit()` calls coalesce into
    one device batch (up to the largest bucket) drained by a worker thread."""

    def __init__(self, service: ClipScoringService,
                 max_wait_ms: float = 2.0):
        self.service = service
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._stats_lock = threading.Lock()
        self._stats = {"requests_total": 0, "clips_total": 0,
                       "batches_total": 0, "errors_total": 0,
                       "last_batch_clips": 0, "max_batch_clips": 0,
                       "score_seconds_total": 0.0}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def stats(self) -> dict:
        """Counters for observability endpoints: coalescing effectiveness is
        ``clips_total / batches_total`` (device batches per request stream)."""
        with self._stats_lock:
            return dict(self._stats)

    def submit(self, clips: np.ndarray, timeout: float = 30.0) -> ScoreResult:
        # uint8 rides through untouched (raw 0-255 pixels, normalized on
        # device); anything else is float clip data in [0, 1]
        arr = np.asarray(clips)
        if arr.dtype != np.uint8:
            arr = np.asarray(arr, np.float32)
        req = _Pending(arr)
        self._q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("scoring request timed out")
        assert req.result is not None
        return req.result

    def close(self) -> None:
        """Stop the worker after it drains any pending requests."""
        self._stop.set()
        self._worker.join(timeout=5.0)
        # fail anything still enqueued so submitters don't hang
        while True:
            try:
                p = self._q.get_nowait()
            except queue.Empty:
                break
            p.result = ScoreResult(scores=np.zeros(0, np.float32),
                                   error="server shutting down")
            p.event.set()

    def _run(self) -> None:
        import time as _time

        cap = self.service.buckets[-1]
        while True:
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                if self._stop.is_set():
                    return  # drained: safe to exit
                continue
            batch: List[_Pending] = [first]
            total = len(first.clips)
            # coalesce within one absolute window (an arrival stream must not
            # keep extending the first request's latency)
            deadline = _time.monotonic() + self.max_wait
            while total < cap:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                batch.append(nxt)
                total += len(nxt.clips)
            # partition by dtype: concatenating a raw-pixel uint8 request
            # with a normalized float32 one would silently promote the
            # uint8 values into 0-255 floats — wrong by 255x.  Each dtype
            # group is one device batch (mixed windows are rare; clients
            # of one deployment normally speak one wire format).
            groups: dict = {}
            for p in batch:
                groups.setdefault(p.clips.dtype.str, []).append(p)
            for grp in groups.values():
                t0 = _time.monotonic()
                try:
                    # the concatenate must sit inside the guard: mixed-shape
                    # requests coalesced into one window raise ValueError
                    # here, and an escaped exception would kill the worker
                    # thread for good (every later submit would time out)
                    clips = np.concatenate([p.clips for p in grp])
                    res = self.service.score(clips)
                except Exception as e:  # a failed batch must not strand submitters
                    n_clips = sum(len(p.clips) for p in grp)
                    with self._stats_lock:
                        s = self._stats
                        s["errors_total"] += 1
                        s["requests_total"] += len(grp)
                        s["clips_total"] += n_clips
                        s["batches_total"] += 1
                    for p in grp:
                        p.result = ScoreResult(scores=np.zeros(0, np.float32),
                                               error=str(e))
                        p.event.set()
                    continue
                with self._stats_lock:
                    s = self._stats
                    s["requests_total"] += len(grp)
                    s["clips_total"] += len(clips)
                    s["batches_total"] += 1
                    s["last_batch_clips"] = len(clips)
                    s["max_batch_clips"] = max(s["max_batch_clips"],
                                               len(clips))
                    s["score_seconds_total"] += _time.monotonic() - t0
                offset = 0
                for p in grp:
                    k = len(p.clips)
                    p.result = ScoreResult(
                        res.scores[offset:offset + k],
                        None if res.graphs is None
                        else res.graphs[offset:offset + k])
                    offset += k
                    p.event.set()


# ---------------------------------------------------------------------------
# Ahead-of-time export (deployment artifacts)
# ---------------------------------------------------------------------------


def export_scorer(variables, clip_shape=(8, 64, 64, 3), model=None,
                  platforms: Optional[Sequence[str]] = None,
                  batch_symbol: str = "b") -> bytes:
    """Serialize the flagship scorer to a self-contained ``jax.export``
    artifact (StableHLO + weights), shape-polymorphic over the batch axis.

    The reference's deployment story is "ship the .pth and the model class"
    (``avenue_training_script_bbox.py:104-155``); this produces a single
    binary blob a serving host can run with no model code at all —
    ``load_scorer(blob)`` returns a callable.  ``platforms`` (e.g.
    ``("tpu", "cpu")``) bakes lowerings for multiple backends into one
    artifact; default is the exporting machine's backend.
    """
    from cvad_tpu.models import CausalAnomalyDetector

    m = model or CausalAnomalyDetector()

    def fwd(clips):
        scores, adj, _ = m.apply(variables, clips, deterministic=True)
        return scores.reshape(-1), adj

    return _export_fwd(fwd, clip_shape, platforms, batch_symbol)


def export_family_b_scorer(variables, memory, clip_shape=(8, 64, 64, 1),
                           loss_cfg=None, model=None,
                           platforms: Optional[Sequence[str]] = None,
                           batch_symbol: str = "b") -> bytes:
    """Family-B combined scorer (0.7 recon MSE + 0.3 memory distance,
    ``causal_anomaly_detection1.py:552``) as an AOT artifact.  The trained
    memory bank is baked in as a constant — scoring-time memory is frozen in
    the reference too (the bank only updates during training)."""
    import jax.numpy as jnp

    from cvad_tpu.config import LossConfig
    from cvad_tpu.models import MemoryVideoAutoEncoder

    m = model or MemoryVideoAutoEncoder()
    w = loss_cfg or LossConfig()

    def fwd(clips):
        out = m.apply(variables, clips, memory, train=False)
        recon_err = jnp.mean((out["reconstructed"] - clips) ** 2,
                             axis=(1, 2, 3, 4))
        return (w.b_score_recon * recon_err
                + w.b_score_memory * out["anomaly_score"])

    return _export_fwd(fwd, clip_shape, platforms, batch_symbol)


def export_family_a_scorer(variables, clip_shape=(16, 240, 360, 1),
                           model=None,
                           platforms: Optional[Sequence[str]] = None,
                           batch_symbol: str = "b") -> bytes:
    """Family-A causal-pipeline scorer as an AOT artifact.

    The deterministic eval forward (``causal_anomaly_detection.py:796-835``):
    returns the blended anomaly scores plus the per-clip detections and their
    validity mask, so a serving host can drive bbox overlays with no model
    code.  Default ``clip_shape`` matches the reference's 16-frame 240x360
    grayscale clips; pass the shape your ``FamilyAConfig`` was trained at.
    """
    from cvad_tpu.models import CausalPipelineDetector

    m = model or CausalPipelineDetector()

    def fwd(clips):
        out = m.apply(variables, clips, deterministic=True)
        return (out["anomaly_scores"].reshape(-1), out["detections"],
                out["detection_mask"])

    return _export_fwd(fwd, clip_shape, platforms, batch_symbol)


def export_family_e_scorer(variables, clip_shape=(8, 64, 64, 3), model=None,
                           platforms: Optional[Sequence[str]] = None,
                           batch_symbol: str = "b") -> bytes:
    """Family-E (bbox-viz stand-in) scorer as an AOT artifact: returns
    ``(scores, adjacency)`` like the flagship family-D blob."""
    from cvad_tpu.models import BBoxVizDetector

    m = model or BBoxVizDetector()

    def fwd(clips):
        scores, adj, _ = m.apply(variables, clips, deterministic=True)
        return scores.reshape(-1), adj

    return _export_fwd(fwd, clip_shape, platforms, batch_symbol)


def export_family_c_scorer(variables, clip_shape=(8, 64, 64, 1), model=None,
                           platforms: Optional[Sequence[str]] = None,
                           batch_symbol: str = "b") -> bytes:
    """Family-C (mini 3D-CNN) sigmoid scorer as an AOT artifact."""
    from cvad_tpu.models import Simple3DCNNDetector

    m = model or Simple3DCNNDetector()

    def fwd(clips):
        return m.apply(variables, clips).reshape(-1)

    return _export_fwd(fwd, clip_shape, platforms, batch_symbol)


def _export_fwd(fwd: Callable, clip_shape, platforms, batch_symbol) -> bytes:
    import jax
    import jax.numpy as jnp

    (b,) = jax.export.symbolic_shape(batch_symbol)
    aval = jax.ShapeDtypeStruct((b,) + tuple(clip_shape), jnp.float32)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return bytes(jax.export.export(jax.jit(fwd), **kw)(aval).serialize())


def load_scorer(blob: bytes) -> Callable:
    """Rehydrate an exported artifact into a score function without importing
    any model code.  Family-D blobs return ``(scores, adjacency)`` numpy
    arrays; family-B/C blobs return the scores array.

    If the host's default backend is not among the blob's lowered platforms
    (e.g. a ``--platforms cpu`` artifact loaded on a TPU machine), execution
    pins to the first platform the blob does carry rather than erroring.
    """
    import jax
    import jax.numpy as jnp

    exported = jax.export.deserialize(bytearray(blob))
    device = None
    platforms = tuple(p.lower() for p in exported.platforms)
    if jax.default_backend().lower() not in platforms:
        for p in platforms:
            try:
                device = jax.devices(p)[0]
                break
            except RuntimeError:
                continue

    def score(batch: np.ndarray):
        batch = np.asarray(batch)
        if batch.dtype == np.uint8:
            # exported avals are float32; raw pixels normalize on host
            # (the in-process scorers normalize on device instead)
            batch = batch.astype(np.float32) / 255.0
        if device is not None:
            with jax.default_device(device):
                out = exported.call(jnp.asarray(batch, jnp.float32))
        else:
            out = exported.call(jnp.asarray(batch, jnp.float32))
        if isinstance(out, (tuple, list)):
            return tuple(np.asarray(o) for o in out)
        return np.asarray(out)

    # the blob knows its own input shape (batch dim is symbolic); expose it
    # so services/servers don't need a per-family lookup
    score.clip_shape = tuple(int(d) for d in exported.in_avals[0].shape[1:])
    return score
