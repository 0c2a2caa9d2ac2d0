"""Forward-pass shape/range tests for all five model families.

Formalizes the reference's inline smoke checks
(``minicausal_vad_complete3.py:458-501`` test_simple_model: build, forward on
random input, assert shape/range/finiteness) as a real suite, per SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.config import (FamilyAConfig, FamilyBConfig, FamilyCConfig,
                             FamilyDConfig, FamilyEConfig)
from cvad_tpu.models import (BBoxVizDetector, CausalAnomalyDetector,
                             CausalPipelineDetector, MemoryVideoAutoEncoder,
                             Simple3DCNNDetector, build_model)
from cvad_tpu.models.family_b import (init_memory, memory_anomaly_score,
                                      update_memory)


def _clips(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 1, shape),
                       jnp.float32)


def test_family_d_forward(rng):
    m = CausalAnomalyDetector()
    x = _clips((2, 8, 64, 64, 3))
    v = m.init(rng, x)
    scores, adj, feats = m.apply(v, x)
    assert scores.shape == (2, 1)
    assert adj.shape == (2, 16, 16)
    assert feats.shape == (2, 16)
    assert jnp.all((scores >= 0) & (scores <= 1))
    assert jnp.all((adj >= 0) & (adj <= 1))
    # no self-loops (avenue_training_script2.py:57-58)
    assert jnp.allclose(jnp.diagonal(adj, axis1=1, axis2=2), 0.0)
    assert np.isfinite(np.asarray(scores)).all()


def test_family_d_param_count(rng):
    # exact parity with the shipped checkpoint: 188,849 params (BASELINE.md)
    m = CausalAnomalyDetector()
    v = m.init(rng, _clips((1, 8, 64, 64, 3)))
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(v["params"]))
    assert n == 188_849


def test_family_c_forward(rng):
    m = Simple3DCNNDetector()
    x = _clips((2, 8, 64, 64, 1))
    v = m.init(rng, x, train=False)
    s = m.apply(v, x)
    assert s.shape == (2, 1)
    assert jnp.all((s >= 0) & (s <= 1))


def test_family_c_batchnorm_updates(rng):
    m = Simple3DCNNDetector()
    x = _clips((2, 8, 32, 32, 1))
    v = m.init(rng, x, train=True)
    _, mutated = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": rng})
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_family_b_forward_and_memory(rng):
    m = MemoryVideoAutoEncoder()
    x = _clips((3, 8, 64, 64, 1))
    mem = init_memory(500, 64)
    v = m.init(rng, x, mem)
    out = m.apply(v, x, mem)
    assert out["reconstructed"].shape == x.shape
    assert out["sequence_feature"].shape == (3, 64)
    assert out["frame_features"].shape == (3, 8, 64)
    # memory below min fill -> zero scores (causal_anomaly_detection1.py:266-268)
    assert jnp.allclose(out["anomaly_score"], 0.0)

    mem = update_memory(mem, out["sequence_feature"])
    assert int(mem.fill) == 3 and int(mem.ptr) == 3
    # fill past threshold: scores become meaningful and bounded
    for i in range(4):
        mem = update_memory(mem, out["sequence_feature"] + 0.1 * i)
    assert int(mem.fill) == 15
    s = memory_anomaly_score(mem, out["sequence_feature"])
    assert s.shape == (3,)
    assert jnp.all((s >= 0) & (s <= 1))
    # exact features now in memory -> near-zero distance
    assert float(s.max()) < 1e-3


def test_family_b_memory_wraparound():
    mem = init_memory(8, 4)
    feats = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
    mem = update_memory(mem, feats)
    assert int(mem.ptr) == 6 and int(mem.fill) == 6
    mem = update_memory(mem, feats)  # wraps: writes slots 6,7,0,1,2,3
    assert int(mem.ptr) == 4 and int(mem.fill) == 8
    np.testing.assert_allclose(np.asarray(mem.memory[6]), np.asarray(feats[0]))
    np.testing.assert_allclose(np.asarray(mem.memory[0]), np.asarray(feats[2]))


def test_family_a_forward(rng):
    cfg = FamilyAConfig(frame_hw=(48, 64))
    m = CausalPipelineDetector(cfg)
    x = _clips((2, 4, 48, 64, 1))
    v = m.init(rng, x)
    out = m.apply(v, x, rng=jax.random.key(1))
    assert out["anomaly_scores"].shape == (2,)
    assert out["adjacency_matrices"].shape == (2, 6, 6)
    assert out["detections"].shape == (2, 4, 5, 4)
    assert out["detection_mask"].shape == (2, 4, 5)
    assert out["kl_losses"].shape == (2,)
    assert out["direct_predictions"].shape == (2, 2)
    np.testing.assert_allclose(
        np.asarray(out["direct_predictions"]).sum(-1), 1.0, rtol=1e-5)
    # every frame has at least one valid detection (fallback-box guarantee,
    # causal_anomaly_detection.py:221-226)
    assert bool(out["detection_mask"].any(axis=-1).all())
    # adjacency diagonal zeroed (:390)
    assert jnp.allclose(jnp.diagonal(out["adjacency_matrices"], axis1=1, axis2=2), 0.0)
    # scores are the reference blend (:574)
    expect = 0.6 * out["causal_anomaly_scores"] + 0.4 * out["direct_predictions"][:, 1]
    np.testing.assert_allclose(np.asarray(out["anomaly_scores"]),
                               np.asarray(expect), rtol=1e-5)


def test_family_e_forward(rng):
    m = BBoxVizDetector()
    x = _clips((2, 8, 64, 64, 3))
    v = m.init(rng, x)
    s, adj, feats = m.apply(v, x)
    assert s.shape == (2,)
    assert adj.shape == (2, 16, 16)
    assert feats.shape == (2, 1024)


def test_registry_builds_all():
    for cfg in (FamilyAConfig(frame_hw=(48, 64)), FamilyBConfig(),
                FamilyCConfig(), FamilyDConfig(), FamilyEConfig()):
        m = build_model(cfg)
        assert m is not None
