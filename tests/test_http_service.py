"""HTTP scoring endpoint: parity with the in-process service, payload
formats, error paths, and the checkpoint/blob sniffing dispatch."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _post(url: str, body: bytes, content_type: str):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": content_type})
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read().decode())


@pytest.fixture(scope="module")
def served():
    """An HTTP server over a small random family-D scorer."""
    from cvad_tpu.config import FamilyDConfig
    from cvad_tpu.evaluation.http_service import ScoringHTTPServer
    from cvad_tpu.evaluation.scoring import make_family_d_score_fn
    from cvad_tpu.evaluation.serving import ClipScoringService
    from cvad_tpu.models import build_model

    model = build_model(FamilyDConfig())
    x1 = np.zeros((1, 8, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x1)
    raw = make_family_d_score_fn(variables, model=model)
    cpu = jax.devices("cpu")[0]

    def fn(x):  # pin to CPU so bucket padding is numerically invisible
        with jax.default_device(cpu):
            return raw(x)

    svc = ClipScoringService(fn, buckets=(2, 4))
    svc.warmup()  # compile both buckets before any request deadline runs
    srv = ScoringHTTPServer(svc, port=0)
    srv.start()
    yield srv, fn
    srv.close()


def test_healthz_and_npz_roundtrip(served):
    srv, fn = served
    base = f"http://{srv.host}:{srv.port}"
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        h = json.loads(r.read().decode())
    assert h["ok"] is True and h["buckets"] == [2, 4]

    x = np.random.default_rng(0).uniform(0, 1, (3, 8, 64, 64, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, clips=x)
    out = _post(base + "/score", buf.getvalue(), "application/octet-stream")
    want_s, want_g = fn(x)
    assert out["n"] == 3
    np.testing.assert_allclose(out["scores"], np.asarray(want_s), atol=1e-5)
    np.testing.assert_allclose(out["graphs"], np.asarray(want_g), atol=1e-5)


def test_raw_npy_and_json_payloads(served):
    srv, fn = served
    base = f"http://{srv.host}:{srv.port}"
    x = np.random.default_rng(1).uniform(0, 1, (2, 8, 64, 64, 3)).astype(np.float32)
    want = np.asarray(fn(x)[0])

    buf = io.BytesIO()
    np.save(buf, x)
    out = _post(base + "/score", buf.getvalue(), "application/octet-stream")
    np.testing.assert_allclose(out["scores"], want, atol=1e-5)

    body = json.dumps({"clips": x.tolist()}).encode()
    out = _post(base + "/score", body, "application/json")
    np.testing.assert_allclose(out["scores"], want, atol=1e-5)


def test_error_paths(served):
    srv, _ = served
    base = f"http://{srv.host}:{srv.port}"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/score", json.dumps({"clips": [1, 2]}).encode(),
              "application/json")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/nope", b"x", "application/json")
    assert e.value.code == 404


def test_concurrent_requests_coalesce(served):
    """Many concurrent small POSTs all come back correct through the
    dynamic-batching worker."""
    import concurrent.futures

    srv, fn = served
    base = f"http://{srv.host}:{srv.port}"
    rng = np.random.default_rng(2)
    xs = [rng.uniform(0, 1, (1, 8, 64, 64, 3)).astype(np.float32)
          for _ in range(6)]

    def one(x):
        buf = io.BytesIO()
        np.savez(buf, clips=x)
        return _post(base + "/score", buf.getvalue(),
                     "application/octet-stream")["scores"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
        got = list(ex.map(one, xs))
    for x, s in zip(xs, got):
        np.testing.assert_allclose(s, np.asarray(fn(x)[0]), atol=1e-5)


def test_uint8_payload_roundtrip(served):
    """uint8 npz payloads (raw 0-255 pixels, 4x smaller wire + H2D) score
    identically to the equivalent normalized float32 payload — the dtype
    survives parse -> batching -> the per-dtype device executable."""
    srv, fn = served
    base = f"http://{srv.host}:{srv.port}"
    u8 = np.random.default_rng(5).integers(0, 256, (3, 8, 64, 64, 3),
                                           dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, clips=u8)
    body = buf.getvalue()
    # the uint8 wire format is actually smaller on the wire
    f32 = u8.astype(np.float32) / 255.0
    buf32 = io.BytesIO()
    np.savez(buf32, clips=f32)
    assert len(body) < len(buf32.getvalue()) / 3

    out = _post(base + "/score", body, "application/octet-stream")
    want = np.asarray(fn(f32)[0])
    np.testing.assert_allclose(out["scores"], want, atol=1e-5)


def test_graphs_omitted_on_request(served):
    """?graphs=0 drops the adjacency matrices from the reply (score-only
    clients skip the (N, d, d) JSON serialization + transfer) while the
    scores stay identical."""
    srv, fn = served
    base = f"http://{srv.host}:{srv.port}"
    x = np.random.default_rng(9).uniform(0, 1, (2, 8, 64, 64, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, clips=x)
    body = buf.getvalue()
    full = _post(base + "/score", body, "application/octet-stream")
    slim = _post(base + "/score?graphs=0", body, "application/octet-stream")
    assert full["graphs"] is not None and slim["graphs"] is None
    np.testing.assert_allclose(slim["scores"], full["scores"], atol=0)


def test_service_from_path_blob_sniffing(tmp_path, rng):
    """service_from_path dispatches .pth (zip) vs jax.export blobs by
    content; the blob-backed service scores identically to the live one."""
    from cvad_tpu.config import FamilyCConfig
    from cvad_tpu.evaluation.http_service import (_is_jax_export,
                                                  service_from_path)
    from cvad_tpu.evaluation.serving import export_family_c_scorer
    from cvad_tpu.models import build_model

    model = build_model(FamilyCConfig())
    x = np.random.default_rng(3).uniform(0, 1, (3, 8, 64, 64, 1)).astype(np.float32)
    variables = model.init(rng, x[:1])
    blob = export_family_c_scorer(variables, platforms=("cpu",))
    assert _is_jax_export(blob)
    p = tmp_path / "c.jaxexport"
    p.write_bytes(blob)
    svc = service_from_path(str(p), family="c", buckets=(4,))
    res = svc.score(x)
    want = np.asarray(model.apply(variables, x)).reshape(-1)
    np.testing.assert_allclose(res.scores, want, atol=1e-5)


def test_stats_counters(served):
    """/stats counters track requests, clips, batches, and score time."""
    srv, _ = served
    base = f"http://{srv.host}:{srv.port}"
    before = json.loads(urllib.request.urlopen(base + "/stats",
                                               timeout=30).read().decode())
    x = np.random.default_rng(4).uniform(0, 1, (2, 8, 64, 64, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, clips=x)
    _post(base + "/score", buf.getvalue(), "application/octet-stream")
    after = json.loads(urllib.request.urlopen(base + "/stats",
                                              timeout=30).read().decode())
    assert after["requests_total"] == before["requests_total"] + 1
    assert after["clips_total"] == before["clips_total"] + 2
    assert after["batches_total"] >= before["batches_total"] + 1
    assert after["score_seconds_total"] > before["score_seconds_total"]
    assert after["last_batch_clips"] >= 2


def test_wrong_shape_rejected_before_batching(served):
    """A wrong-shape request gets an immediate 400 naming the expected
    shape, and the batching worker survives to serve valid traffic."""
    srv, fn = served
    base = f"http://{srv.host}:{srv.port}"
    bad = np.zeros((1, 8, 32, 32, 3), np.float32)
    buf = io.BytesIO()
    np.savez(buf, clips=bad)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/score", buf.getvalue(), "application/octet-stream")
    assert e.value.code == 400
    assert "(8, 64, 64, 3)" in e.value.read().decode()

    good = np.random.default_rng(5).uniform(
        0, 1, (1, 8, 64, 64, 3)).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, clips=good)
    out = _post(base + "/score", buf.getvalue(), "application/octet-stream")
    np.testing.assert_allclose(out["scores"], np.asarray(fn(good)[0]),
                               atol=1e-5)


def test_blob_carries_clip_shape(tmp_path, rng):
    """Exported blobs advertise their own input shape — service_from_path
    ignores the family default for blob inputs."""
    from cvad_tpu.config import FamilyCConfig
    from cvad_tpu.evaluation.http_service import service_from_path
    from cvad_tpu.evaluation.serving import export_family_c_scorer, load_scorer
    from cvad_tpu.models import build_model

    model = build_model(FamilyCConfig())
    variables = model.init(rng, np.zeros((1, 8, 64, 64, 1), np.float32))
    blob = export_family_c_scorer(variables, platforms=("cpu",))
    assert load_scorer(blob).clip_shape == (8, 64, 64, 1)
    p = tmp_path / "c.blob"
    p.write_bytes(blob)
    # family left at the (wrong for this blob) default 'd'
    svc = service_from_path(str(p), buckets=(2,))
    assert svc.clip_shape == (8, 64, 64, 1)
    svc.warmup()  # compiles with the blob's true shape


def test_empty_file_rejected(tmp_path):
    from cvad_tpu.evaluation.http_service import service_from_path

    p = tmp_path / "empty.pth"
    p.write_bytes(b"")
    with pytest.raises(ValueError, match="empty file"):
        service_from_path(str(p))


def test_finite_or_null():
    from cvad_tpu.evaluation.http_service import _finite_or_null

    out = _finite_or_null(np.array([1.0, np.nan, np.inf, -np.inf]))
    assert out == [1.0, None, None, None]
    assert json.loads(json.dumps({"scores": out})) == {
        "scores": [1.0, None, None, None]}
