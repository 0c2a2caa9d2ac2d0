"""Serving path: bucket padding, chunking, dynamic batching, remat option."""

import threading

import numpy as np
import pytest

from cvad_tpu.evaluation.serving import BatchingServer, ClipScoringService


def _fake_score(seen_batches):
    def fn(batch):
        seen_batches.append(len(batch))
        return batch.mean(axis=(1, 2, 3, 4)), np.zeros((len(batch), 4, 4))

    return fn


def test_bucket_padding_and_trim():
    seen = []
    svc = ClipScoringService(_fake_score(seen), buckets=(4, 16))
    clips = np.random.default_rng(0).uniform(0, 1, (3, 2, 8, 8, 1)).astype(np.float32)
    res = svc.score(clips)
    assert seen == [4]  # padded to the 4-bucket
    assert res.scores.shape == (3,)  # trimmed back
    np.testing.assert_allclose(res.scores, clips.mean(axis=(1, 2, 3, 4)),
                               rtol=1e-6)
    assert res.graphs.shape == (3, 4, 4)


def test_oversize_request_chunks():
    seen = []
    svc = ClipScoringService(_fake_score(seen), buckets=(4,))
    clips = np.ones((10, 2, 4, 4, 1), np.float32)
    res = svc.score(clips)
    assert res.scores.shape == (10,)
    assert seen == [4, 4, 4]  # 4 + 4 + 2(padded to 4)


def test_batching_server_coalesces():
    seen = []
    svc = ClipScoringService(_fake_score(seen), buckets=(8,))
    server = BatchingServer(svc, max_wait_ms=50.0)
    clips = np.random.default_rng(1).uniform(0, 1, (2, 2, 4, 4, 1)).astype(np.float32)
    results = [None, None]

    def call(i):
        results[i] = server.submit(clips + i)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.close()
    for i in (0, 1):
        np.testing.assert_allclose(results[i].scores,
                                   (clips + i).mean(axis=(1, 2, 3, 4)),
                                   rtol=1e-6)


def test_service_from_checkpoint():
    import os

    if not os.path.exists("/root/reference/best_improved_model.pth"):
        pytest.skip("reference checkpoint absent")
    svc = ClipScoringService.from_torch_checkpoint(
        "/root/reference/best_improved_model.pth", buckets=(2,))
    clips = np.random.default_rng(0).uniform(0, 1, (2, 8, 64, 64, 3)).astype(np.float32)
    res = svc.score(clips)
    assert res.scores.shape == (2,)
    assert 0.12 < res.scores.mean() < 0.16  # known checkpoint score band
    assert res.graphs.shape == (2, 16, 16)


def test_family_a_remat_equivalence(rng):
    """remat=True must not change outputs (only the backward memory plan)."""
    import jax
    import jax.numpy as jnp

    from cvad_tpu.config import FamilyAConfig
    from cvad_tpu.models import CausalPipelineDetector

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 4, 32, 48, 1)),
                    jnp.float32)
    cfg = FamilyAConfig(frame_hw=(32, 48))
    m_plain = CausalPipelineDetector(cfg)
    m_remat = CausalPipelineDetector(cfg.replace(remat=True))
    v = m_plain.init(rng, x)
    out_plain = m_plain.apply(v, x)
    out_remat = m_remat.apply(v, x)
    np.testing.assert_allclose(np.asarray(out_plain["anomaly_scores"]),
                               np.asarray(out_remat["anomaly_scores"]),
                               rtol=1e-5)

    def loss(params, model):
        out = model.apply({"params": params,
                           "batch_stats": v["batch_stats"]}, x)
        return jnp.sum(out["anomaly_scores"])

    g1 = jax.grad(loss)(v["params"], m_plain)
    g2 = jax.grad(loss)(v["params"], m_remat)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_empty_request():
    svc = ClipScoringService(_fake_score([]), buckets=(4,))
    res = svc.score(np.zeros((0, 2, 4, 4, 1), np.float32))
    assert res.scores.shape == (0,)


def test_close_drains_pending():
    import time

    slow_calls = []

    def slow_score(batch):
        time.sleep(0.05)
        slow_calls.append(len(batch))
        return batch.mean(axis=(1, 2, 3, 4)), None

    svc = ClipScoringService(slow_score, buckets=(4,))
    server = BatchingServer(svc, max_wait_ms=10.0)
    clips = np.ones((2, 2, 4, 4, 1), np.float32)
    res = server.submit(clips)
    assert res.scores.shape == (2,)
    server.close()  # returns promptly, no hung submitters
