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


def test_mixed_dtype_window_partitions():
    """A coalesce window holding a raw-pixel uint8 request and a normalized
    float32 one must NOT concatenate them (uint8 would silently promote to
    0-255 floats — wrong by 255x).  The worker partitions by dtype: one
    device batch per dtype group, each with its own semantics."""

    def fn(batch):
        # normalize exactly like the device-side uint8 executable so both
        # groups' expected scores are computable from the same formula
        x = (batch.astype(np.float32) / 255.0
             if batch.dtype == np.uint8 else batch)
        return x.mean(axis=(1, 2, 3, 4)), None

    svc = ClipScoringService(fn, buckets=(8,))
    # long window so both submits definitely coalesce before the worker runs
    server = BatchingServer(svc, max_wait_ms=200.0)
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (2, 2, 4, 4, 1), dtype=np.uint8)
    f32 = rng.uniform(0, 1, (2, 2, 4, 4, 1)).astype(np.float32)
    results = {}

    def call(key, clips):
        results[key] = server.submit(clips)

    threads = [threading.Thread(target=call, args=("u8", u8)),
               threading.Thread(target=call, args=("f32", f32))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stats = server.stats()
    server.close()
    np.testing.assert_allclose(results["u8"].scores,
                               (u8.astype(np.float32) / 255.0)
                               .mean(axis=(1, 2, 3, 4)), rtol=1e-6)
    np.testing.assert_allclose(results["f32"].scores,
                               f32.mean(axis=(1, 2, 3, 4)), rtol=1e-6)
    assert results["u8"].error is None and results["f32"].error is None
    # both requests arrived, split into (at most) one batch per dtype
    assert stats["requests_total"] == 2
    assert stats["batches_total"] <= 2


def test_uint8_submit_preserves_dtype():
    """submit() must not cast uint8 payloads to float32 (that would both
    break the raw-pixel semantics and forfeit the 4x transfer win)."""
    seen_dtypes = []

    def fn(batch):
        seen_dtypes.append(batch.dtype)
        x = (batch.astype(np.float32) / 255.0
             if batch.dtype == np.uint8 else batch)
        return x.mean(axis=(1, 2, 3, 4)), None

    svc = ClipScoringService(fn, buckets=(4,))
    server = BatchingServer(svc, max_wait_ms=1.0)
    u8 = np.random.default_rng(3).integers(0, 256, (3, 2, 4, 4, 1),
                                           dtype=np.uint8)
    res = server.submit(u8)
    server.close()
    assert seen_dtypes == [np.dtype(np.uint8)]
    np.testing.assert_allclose(
        res.scores,
        (u8.astype(np.float32) / 255.0).mean(axis=(1, 2, 3, 4)), rtol=1e-6)


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


@pytest.mark.slow
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


def test_bulk_score_matches_per_batch(rng):
    """Throughput-mode scorer (stacked dispatch, uint8 ingest) == the
    per-batch scorer on the same weights, in BOTH lowerings (the default
    one-flat-forward and the sequential lax.map kept for comparison)."""
    import jax

    from cvad_tpu.config import FamilyDConfig
    from cvad_tpu.models import CausalAnomalyDetector
    from cvad_tpu.evaluation.scoring import (make_family_d_bulk_score_fn,
                                             make_family_d_score_fn)

    m = CausalAnomalyDetector(FamilyDConfig())
    r = np.random.default_rng(0)
    clips_u8 = r.integers(0, 256, (11, 8, 16, 16, 3), dtype=np.uint8)
    v = m.init(jax.random.key(0), (clips_u8[:1] / 255.0).astype(np.float32))
    ref = make_family_d_score_fn(v, model=m)
    s0, a0 = ref((clips_u8 / 255.0).astype(np.float32))
    for mode in ("flat", "map"):
        bulk = make_family_d_bulk_score_fn(v, model=m, batch=4,
                                           chunks_per_call=2, mode=mode)
        s1, a1 = bulk(clips_u8)
        assert s1.shape == (11,) and a1.shape == (11, 16, 16), mode
        np.testing.assert_allclose(s1, s0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a1, a0, rtol=1e-5, atol=1e-6)

        # empty request contract
        s2, a2 = bulk(clips_u8[:0])
        assert s2.shape == (0,) and a2.shape == (0, 16, 16)


def test_export_scorer_roundtrip(rng):
    """AOT deployment artifact: export -> serialize -> load -> identical
    scores, shape-polymorphic over batch (no model code on the load side)."""
    import jax

    from cvad_tpu.evaluation.serving import (ClipScoringService,
                                             export_scorer, load_scorer)
    from cvad_tpu.models import CausalAnomalyDetector

    m = CausalAnomalyDetector()
    x5 = np.random.default_rng(0).uniform(0, 1, (5, 8, 64, 64, 3)).astype(np.float32)
    v = m.init(rng, x5[:1])

    blob = export_scorer(v, platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000
    score = load_scorer(blob)

    ref_s, ref_adj, _ = m.apply(v, x5, deterministic=True)
    s, adj = score(x5)
    np.testing.assert_allclose(s, np.asarray(ref_s).reshape(-1), atol=1e-5)
    np.testing.assert_allclose(adj, np.asarray(ref_adj), atol=1e-5)
    # symbolic batch: a different N runs through the same artifact
    s3, _ = score(x5[:3])
    np.testing.assert_allclose(s3, s[:3], atol=1e-5)

    svc = ClipScoringService.from_exported(blob, buckets=(4, 8))
    res = svc.score(x5)
    np.testing.assert_allclose(res.scores, s, atol=1e-5)

    # uint8 raw pixels through the AOT blob == normalized float32 scores
    # (the exported aval is f32, so load_scorer normalizes host-side)
    u8 = np.random.default_rng(1).integers(0, 256, (3, 8, 64, 64, 3),
                                           dtype=np.uint8)
    su8, _ = score(u8)
    sf, _ = score(u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(su8, sf, atol=1e-6)


def test_export_family_b_and_c_roundtrip(rng):
    """B (memory baked in as constant) and C artifacts reproduce the live
    scorers through serialize -> deserialize on a symbolic batch."""
    import jax

    from cvad_tpu.config import FamilyBConfig, FamilyCConfig
    from cvad_tpu.evaluation.scoring import make_family_b_score_fn
    from cvad_tpu.evaluation.serving import (export_family_b_scorer,
                                             export_family_c_scorer,
                                             load_scorer)
    from cvad_tpu.models import build_model
    from cvad_tpu.models.family_b import init_memory, update_memory

    x = np.random.default_rng(4).uniform(0, 1, (3, 8, 64, 64, 1)).astype(np.float32)

    bcfg = FamilyBConfig()
    mb = build_model(bcfg)
    mem = init_memory(bcfg.memory_size, bcfg.latent_dim)
    vb = mb.init(rng, x[:1], mem)
    # half-filled bank so the memory term is active
    feats = np.random.default_rng(5).normal(
        size=(bcfg.memory_size // 2, bcfg.latent_dim)).astype(np.float32)
    mem = update_memory(mem, feats)
    blob_b = export_family_b_scorer(vb, mem, platforms=("cpu",))
    live = make_family_b_score_fn(vb, mem)(x)
    np.testing.assert_allclose(load_scorer(blob_b)(x),
                               np.asarray(live).reshape(-1), atol=1e-5)

    ccfg = FamilyCConfig()
    mc = build_model(ccfg)
    vc = mc.init(rng, x[:1])
    blob_c = export_family_c_scorer(vc, platforms=("cpu",))
    ref = np.asarray(mc.apply(vc, x)).reshape(-1)
    np.testing.assert_allclose(load_scorer(blob_c)(x), ref, atol=1e-5)


@pytest.mark.slow
def test_export_family_a_and_e_roundtrip(rng):
    """A (masked pipeline; small frames) and E artifacts reproduce the live
    deterministic forwards through serialize -> deserialize."""
    from cvad_tpu.config import FamilyAConfig, FamilyEConfig
    from cvad_tpu.evaluation.serving import (export_family_a_scorer,
                                             export_family_e_scorer,
                                             load_scorer)
    from cvad_tpu.models import build_model

    acfg = FamilyAConfig(frame_hw=(64, 64), backbone_pool=(2, 2))
    ma = build_model(acfg)
    xa = np.random.default_rng(6).uniform(0, 1, (3, 8, 64, 64, 1)).astype(np.float32)
    va = ma.init(rng, xa[:1])
    blob_a = export_family_a_scorer(va, clip_shape=xa.shape[1:], model=ma,
                                    platforms=("cpu",))
    s, boxes, mask = load_scorer(blob_a)(xa)
    out = ma.apply(va, xa, deterministic=True)
    np.testing.assert_allclose(s, np.asarray(out["anomaly_scores"]).reshape(-1),
                               atol=1e-5)
    np.testing.assert_allclose(boxes, np.asarray(out["detections"]), atol=1e-5)
    assert (mask == np.asarray(out["detection_mask"])).all()

    ecfg = FamilyEConfig()
    me = build_model(ecfg)
    xe = np.random.default_rng(7).uniform(0, 1, (3, 8, 64, 64, 3)).astype(np.float32)
    ve = me.init(rng, xe[:1])
    blob_e = export_family_e_scorer(ve, model=me, platforms=("cpu",))
    se, adje = load_scorer(blob_e)(xe)
    rs, radj, _ = me.apply(ve, xe, deterministic=True)
    np.testing.assert_allclose(se, np.asarray(rs).reshape(-1), atol=1e-5)
    np.testing.assert_allclose(adje, np.asarray(radj), atol=1e-5)
