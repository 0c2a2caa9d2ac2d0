"""Loss-function tests: the vectorized 5-term improved loss must equal the
reference's loop-based semantics (``avenue_training_script2.py:135-205``),
checked against a direct numpy transliteration of those semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvad_tpu.config import LossConfig
from cvad_tpu.ops.losses import (binary_cross_entropy, family_a_loss,
                                 family_b_reconstruction_loss, focal_bce,
                                 improved_loss, pseudo_labels)


def _npy_reference_loss(scores, adj, targets, cfg: LossConfig):
    """Numpy oracle with the reference's explicit pair loop."""
    eps = 1e-7
    p = np.clip(scores.reshape(-1), eps, 1 - eps)
    ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    pt = np.exp(-ce)
    anomaly = np.mean(cfg.focal_alpha * (1 - pt) ** cfg.focal_gamma * ce)

    mean_adj = adj.mean(0)
    acyc = np.trace(mean_adj @ mean_adj)

    sparsity_ratio = (adj > cfg.edge_threshold).mean()
    sparsity = abs(sparsity_ratio - cfg.target_sparsity)

    normal_idx = np.where(targets == 0)[0]
    dists = []
    for ii, i in enumerate(normal_idx):
        for j in normal_idx[ii + 1:]:
            dists.append(np.abs(adj[i] - adj[j]).mean())
    consistency = abs(np.mean(dists) - cfg.consistency_target) if dists else 0.0

    ec = (adj > cfg.edge_threshold).sum()
    if ec < cfg.min_edges:
        structure = (cfg.min_edges - ec) * 0.01
    elif ec > cfg.max_edges:
        structure = (ec - cfg.max_edges) * 0.01
    else:
        structure = 0.0

    return (cfg.anomaly_weight * anomaly + cfg.causal_weight * acyc
            + cfg.sparsity_weight * sparsity
            + cfg.consistency_weight * consistency
            + cfg.structure_weight * structure)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_improved_loss_matches_reference_semantics(seed):
    rng = np.random.default_rng(seed)
    b = 6
    scores = rng.uniform(0.05, 0.95, (b, 1)).astype(np.float32)
    adj = rng.uniform(0, 1, (b, 16, 16)).astype(np.float32)
    targets = (rng.uniform(size=b) > 0.6).astype(np.float32)
    cfg = LossConfig()

    total, comps = improved_loss(jnp.asarray(scores), jnp.asarray(adj),
                                 jnp.asarray(targets), cfg)
    expect = _npy_reference_loss(scores, adj, targets, cfg)
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)
    assert set(comps) == {"anomaly_loss", "acyclicity_loss", "sparsity_loss",
                          "consistency_loss", "structure_loss", "edge_count",
                          "sparsity_ratio"}


def test_improved_loss_single_normal_sample():
    """<2 normal samples -> consistency loss 0 (reference :176-177)."""
    scores = jnp.full((2, 1), 0.5)
    adj = jnp.zeros((2, 4, 4))
    targets = jnp.array([1.0, 1.0])
    _, comps = improved_loss(scores, adj, targets, LossConfig())
    assert float(comps["consistency_loss"]) == 0.0


def test_focal_bce_reduces_easy_examples():
    p = jnp.array([0.9, 0.1])
    t = jnp.array([1.0, 1.0])
    easy = float(focal_bce(p[:1], t[:1]))
    hard = float(focal_bce(p[1:], t[1:]))
    assert hard > easy * 10


def test_bce_matches_torch_formula():
    p = jnp.array([0.2, 0.7])
    t = jnp.array([0.0, 1.0])
    got = np.asarray(binary_cross_entropy(p, t))
    expect = np.array([-np.log(0.8), -np.log(0.7)])
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_pseudo_labels_rate():
    labels = pseudo_labels(jax.random.key(0), 20_000, 0.05)
    assert 0.03 < float(labels.mean()) < 0.07


def test_family_a_loss_components():
    b = 4
    rng = np.random.default_rng(0)
    out = {
        "direct_predictions": jnp.asarray(
            np.abs(rng.dirichlet([1, 1], size=b)).astype(np.float32)),
        "anomaly_scores": jnp.asarray(rng.uniform(0, 1, b).astype(np.float32)),
        "causal_anomaly_scores": jnp.asarray(rng.uniform(0, 1, b).astype(np.float32)),
        "kl_losses": jnp.asarray(rng.uniform(0, 1, b).astype(np.float32)),
    }
    labels = jnp.array([0, 1, 0, 1])
    total, comps = family_a_loss(out, labels)
    manual = (0.4 * comps["ce"] + 0.3 * comps["score_mse"]
              + 0.2 * comps["causal_mse"] + 0.1 * comps["kl"])
    np.testing.assert_allclose(float(total), float(manual), rtol=1e-6)


def test_family_b_recon_loss_fallback():
    pred = jnp.full((2, 4), 0.5)
    target = jnp.full((2, 4), 0.25)
    assert abs(float(family_b_reconstruction_loss(pred, target)) - 0.0625) < 1e-6
    # non-finite target -> still finite output via fallback chain
    bad = jnp.array([[jnp.inf, 0.5], [0.5, 0.5]])
    assert np.isfinite(float(family_b_reconstruction_loss(pred[:, :2], bad)))
