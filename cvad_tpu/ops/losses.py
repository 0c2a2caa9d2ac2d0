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
              gamma: float = 2.0, valid: jnp.ndarray | None = None
              ) -> jnp.ndarray:
    """Focal loss exactly as the reference composes it
    (``avenue_training_script2.py:143-149``): ce -> pt=exp(-ce) ->
    alpha*(1-pt)^gamma*ce, mean.  `valid` masks padded rows out of the mean
    (DP remainder batches)."""
    ce = binary_cross_entropy(p, t)
    pt = jnp.exp(-ce)
    focal = alpha * (1.0 - pt) ** gamma * ce
    return _masked_mean(focal, valid)


def _masked_mean(x: jnp.ndarray, valid: jnp.ndarray | None) -> jnp.ndarray:
    """Mean over axis-0-valid rows; plain mean when no mask."""
    if valid is None:
        return jnp.mean(x)
    w = valid.reshape(valid.shape[0], *([1] * (x.ndim - 1)))
    return jnp.sum(x * w) / jnp.maximum(valid.sum() * (x.size / x.shape[0]), 1.0)


def pseudo_labels(rng: jax.Array, batch: int, rate: float) -> jnp.ndarray:
    """Random pseudo-labels (``:139-141``): `rate` fraction anomalous."""
    return (jax.random.uniform(rng, (batch,)) > (1.0 - rate)).astype(jnp.float32)


def improved_loss(
    anomaly_scores: jnp.ndarray,  # (B, 1) or (B,)
    causal_adj: jnp.ndarray,  # (B, N, N)
    pseudo_targets: jnp.ndarray,  # (B,)
    cfg: LossConfig = LossConfig(),
    valid: jnp.ndarray | None = None,  # (B,) 1.0=real row, 0.0=DP padding
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Family-D 5-term loss (``avenue_training_script2.py:135-205``).

    Terms: focal anomaly, acyclicity tr((mean adj)^2), adaptive sparsity
    |sparsity-0.3|, consistency |avg pairwise normal-adj L1 - 0.1|, structure
    band penalty on the batch edge count.  Caller supplies pseudo-labels so
    the same function serves training (random labels) and supervised paths.
    With `valid` set, padded remainder rows are excluded from every term, so
    a padded batch produces exactly the gradient of its real rows.
    """
    from cvad_tpu.ops.pallas_kernels import pairwise_l1_mean

    b = causal_adj.shape[0]
    v = jnp.ones(b, jnp.float32) if valid is None else valid.astype(jnp.float32)
    n_valid = jnp.maximum(v.sum(), 1.0)
    scores = anomaly_scores.reshape(-1)
    anomaly = focal_bce(scores, pseudo_targets, cfg.focal_alpha,
                        cfg.focal_gamma, valid=valid)

    mean_adj = (causal_adj * v[:, None, None]).sum(axis=0) / n_valid
    acyclicity = jnp.trace(mean_adj @ mean_adj)

    edges = (causal_adj > cfg.edge_threshold).astype(jnp.float32)
    per_cell = causal_adj.shape[1] * causal_adj.shape[2]
    edge_count = (edges * v[:, None, None]).sum()
    current_sparsity = edge_count / (n_valid * per_cell)
    sparsity = jnp.abs(current_sparsity - cfg.target_sparsity)

    # consistency (:161-177): avg pairwise |adj_i - adj_j| over normal pairs,
    # pulled toward cfg.consistency_target — one masked pairwise reduction
    # (Pallas streaming kernel on TPU; vectorized XLA elsewhere)
    normal = (pseudo_targets == 0).astype(jnp.float32) * v  # (B,)
    flat = causal_adj.reshape(b, -1)
    avg_dist, n_pairs = pairwise_l1_mean(flat, normal)
    consistency = jnp.where(n_pairs > 0,
                            jnp.abs(avg_dist - cfg.consistency_target), 0.0)

    # structure band (:180-189): batch-total edge count kept in [min, max]
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
                  cfg: LossConfig = LossConfig(),
                  valid: jnp.ndarray | None = None
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Family-A 4-term loss (``causal_anomaly_detection.py:649-662``):
    0.4 CE(direct) + 0.3 MSE(final, label) + 0.2 MSE(causal, label) + 0.1 KL.
    `valid` masks DP padding rows out of every per-sample mean."""
    labels_f = labels.astype(jnp.float32)
    direct = jnp.clip(outputs["direct_predictions"], _EPS, 1.0)
    ce = _masked_mean(
        -jnp.log(direct[jnp.arange(direct.shape[0]), labels.astype(jnp.int32)]),
        valid)
    score_mse = _masked_mean((outputs["anomaly_scores"] - labels_f) ** 2, valid)
    causal_mse = _masked_mean(
        (outputs["causal_anomaly_scores"] - labels_f) ** 2, valid)
    kl = _masked_mean(outputs["kl_losses"], valid)
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
