"""Multi-objective loss functions for all model families.

The family-D "improved loss" reproduces ``avenue_training_script2.py:135-205``
term by term, with the O(B^2) Python pair loop of the consistency term
(``:166-169``) vectorized into one pairwise-distance matrix — on TPU the whole
5-term loss fuses into the backward pass as elementwise + reduction ops.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from cvad_tpu.config import LossConfig

_EPS = 1e-7


def binary_cross_entropy(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE on probabilities (torch ``F.binary_cross_entropy``)."""
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def focal_bce(p: jnp.ndarray, t: jnp.ndarray, alpha: float = 0.25,
              gamma: float = 2.0) -> jnp.ndarray:
    """Focal loss exactly as the reference composes it
    (``avenue_training_script2.py:143-149``): ce -> pt=exp(-ce) ->
    alpha*(1-pt)^gamma*ce, mean."""
    ce = binary_cross_entropy(p, t)
    pt = jnp.exp(-ce)
    return jnp.mean(alpha * (1.0 - pt) ** gamma * ce)


def pseudo_labels(rng: jax.Array, batch: int, rate: float) -> jnp.ndarray:
    """Random pseudo-labels (``:139-141``): `rate` fraction anomalous."""
    return (jax.random.uniform(rng, (batch,)) > (1.0 - rate)).astype(jnp.float32)


def improved_loss(
    anomaly_scores: jnp.ndarray,  # (B, 1) or (B,)
    causal_adj: jnp.ndarray,  # (B, N, N)
    pseudo_targets: jnp.ndarray,  # (B,)
    cfg: LossConfig = LossConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Family-D 5-term loss (``avenue_training_script2.py:135-205``).

    Terms: focal anomaly, acyclicity tr((mean adj)^2), adaptive sparsity
    |sparsity-0.3|, consistency |avg pairwise normal-adj L1 - 0.1|, structure
    band penalty on the batch edge count.  Caller supplies pseudo-labels so
    the same function serves training (random labels) and supervised paths.
    """
    scores = anomaly_scores.reshape(-1)
    anomaly = focal_bce(scores, pseudo_targets, cfg.focal_alpha, cfg.focal_gamma)

    mean_adj = causal_adj.mean(axis=0)
    acyclicity = jnp.trace(mean_adj @ mean_adj)

    edges = (causal_adj > cfg.edge_threshold).astype(jnp.float32)
    current_sparsity = edges.mean()
    sparsity = jnp.abs(current_sparsity - cfg.target_sparsity)

    # consistency (:161-177): avg pairwise |adj_i - adj_j| over normal pairs,
    # pulled toward cfg.consistency_target — vectorized over all pairs
    normal = (pseudo_targets == 0).astype(jnp.float32)  # (B,)
    flat = causal_adj.reshape(causal_adj.shape[0], -1)
    pair_l1 = jnp.abs(flat[:, None, :] - flat[None, :, :]).mean(-1)  # (B, B)
    b = flat.shape[0]
    upper = jnp.triu(jnp.ones((b, b)), k=1)
    pair_mask = upper * normal[:, None] * normal[None, :]
    n_pairs = pair_mask.sum()
    avg_dist = (pair_l1 * pair_mask).sum() / jnp.maximum(n_pairs, 1.0)
    consistency = jnp.where(n_pairs > 0,
                            jnp.abs(avg_dist - cfg.consistency_target), 0.0)

    # structure band (:180-189): batch-total edge count kept in [min, max]
    edge_count = edges.sum()
    structure = jnp.where(
        edge_count < cfg.min_edges, (cfg.min_edges - edge_count) * 0.01,
        jnp.where(edge_count > cfg.max_edges, (edge_count - cfg.max_edges) * 0.01,
                  0.0))

    total = (cfg.anomaly_weight * anomaly
             + cfg.causal_weight * acyclicity
             + cfg.sparsity_weight * sparsity
             + cfg.consistency_weight * consistency
             + cfg.structure_weight * structure)
    components = {
        "anomaly_loss": anomaly,
        "acyclicity_loss": acyclicity,
        "sparsity_loss": sparsity,
        "consistency_loss": consistency,
        "structure_loss": structure,
        "edge_count": edge_count,
        "sparsity_ratio": current_sparsity,
    }
    return total, components


def family_a_loss(outputs: Dict[str, jnp.ndarray], labels: jnp.ndarray,
                  cfg: LossConfig = LossConfig()
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Family-A 4-term loss (``causal_anomaly_detection.py:649-662``):
    0.4 CE(direct) + 0.3 MSE(final, label) + 0.2 MSE(causal, label) + 0.1 KL."""
    labels_f = labels.astype(jnp.float32)
    direct = jnp.clip(outputs["direct_predictions"], _EPS, 1.0)
    ce = -jnp.mean(jnp.log(direct[jnp.arange(direct.shape[0]), labels.astype(jnp.int32)]))
    score_mse = jnp.mean((outputs["anomaly_scores"] - labels_f) ** 2)
    causal_mse = jnp.mean((outputs["causal_anomaly_scores"] - labels_f) ** 2)
    kl = jnp.mean(outputs["kl_losses"])
    total = (cfg.a_ce * ce + cfg.a_score_mse * score_mse
             + cfg.a_causal_mse * causal_mse + cfg.a_kl * kl)
    return total, {"ce": ce, "score_mse": score_mse, "causal_mse": causal_mse,
                   "kl": kl}


def family_b_reconstruction_loss(pred: jnp.ndarray, target: jnp.ndarray
                                 ) -> jnp.ndarray:
    """Reconstruction loss with the reference's MSE -> L1 -> 0 fallback chain
    (``causal_anomaly_detection1.py:323-344``), expressed as finite-ness
    selects instead of host-side exception handling."""
    pred = jnp.clip(pred, 1e-8, 1.0 - 1e-8)
    mse = jnp.mean((pred - target) ** 2)
    l1 = jnp.mean(jnp.abs(pred - target))
    out = jnp.where(jnp.isfinite(mse), mse, l1)
    return jnp.where(jnp.isfinite(out), out, 0.0)
