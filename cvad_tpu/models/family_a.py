"""Family A — 12-stage causal pipeline, redesigned with fixed-shape masked ops.

TPU-native rebuild of ``causal_anomaly_detection.py:110-586`` (enhanced
variant; the earlier ``video_anomaly_detection.py:67-454`` anchor variant is
the `anchor_variant` config switch).  The reference's stages 2-6 are ragged
Python loops that serialize the accelerator (SURVEY.md §3.1); here every stage
is a batched, statically-shaped op so the whole 12-stage forward compiles to
one XLA program:

  stage  reference (ragged)                          here (masked)
  2      per-(b,t,box) Python filter loops           (B,T,K,4) boxes + (B,T,K) validity mask
         ``:207-229``                                 with fallback-box substitution
  3      list-of-lists ReID + padding ``:248-274``   one batched ReID MLP over (B,T,K,4)
  4      per-trajectory GRU calls ``:290-300``       single `nn.scan` GRU over (B*K, T)
  5      per-batch-item VAE loop ``:337-351``        batched mu/logvar + reparameterize
  6      python double loop over edges ``:382-387``  one (B,N,N,2H) edge-MLP einsum
  7-10   per-item loops ``:415-502``                 batched dynamics/scorers/blend

"Trajectory k" keeps the reference's semantics: the k-th detection slot traced
through time.  A trajectory is valid iff any frame's k-th box passed the
coordinate filter; invalid slots are zero rows (exactly the reference's zero
padding) and are excluded from masked means, matching the reference's
dropped-trajectory behavior.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cvad_tpu.config import FamilyAConfig
from cvad_tpu.models.layers import MLP, MaskedBatchNorm, adaptive_avg_pool2d


def _cdtype(cfg: FamilyAConfig) -> jnp.dtype:
    """Computation dtype; params/BN-stats stay float32 (B/C/D contract)."""
    return jnp.dtype(getattr(cfg, "dtype", "float32"))


class ResNetBackbone(nn.Module):
    """Per-frame 2D conv backbone (``causal_anomaly_detection.py:110-158``):
    7x7/s2 conv -> BN -> ReLU -> maxpool -> 4 plain conv stages -> adaptive
    pool (4,6).  Time folds into batch; output (B, T, 256*4*6)."""

    cfg: FamilyAConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 sample_valid: jnp.ndarray | None = None) -> jnp.ndarray:
        b, t = x.shape[0], x.shape[1]
        dtype = _cdtype(self.cfg)
        x = x.reshape((b * t,) + x.shape[2:]).astype(dtype)  # (B*T, H, W, C)
        # DP-padding mask per clip -> per folded frame row
        fvalid = None if sample_valid is None else jnp.repeat(sample_valid, t)

        def bn(h, name):
            # MaskedBatchNorm accumulates stats in f32, returns h.dtype
            return MaskedBatchNorm(name=name)(h, train=train, valid=fvalid)

        ch = self.cfg.backbone_channels
        x = nn.Conv(ch[0], (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    dtype=dtype, name="conv1")(x)
        x = nn.relu(bn(x, "bn1"))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        strides = (1, 2, 2, 2)
        for li, (c, s) in enumerate(zip(ch[1:], strides)):
            # each stage: stride conv + one unit conv, both with BN+ReLU (:128-139)
            x = nn.Conv(c, (3, 3), strides=(s, s), padding=[(1, 1), (1, 1)],
                        dtype=dtype, name=f"layer{li + 1}_conv0")(x)
            x = nn.relu(bn(x, f"layer{li + 1}_bn0"))
            x = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=dtype, name=f"layer{li + 1}_conv1")(x)
            x = nn.relu(bn(x, f"layer{li + 1}_bn1"))

        x = adaptive_avg_pool2d(x, self.cfg.backbone_pool)
        # natural (h, w, c) flatten — NO per-step transpose (the traced
        # channel-major relayout cost ~1.4 ms/step in f32<->bf16 copies).
        # torch checkpoint parity is preserved by permuting the ROWS of the
        # two torch-imported consumers (detector dense_0, direct-classifier
        # dense_0) once at import time instead
        # (runtime/checkpoint.py::family_a_feature_permutation).
        return x.reshape(b, t, -1)


class MaskedPedestrianDetector(nn.Module):
    """Fixed-K detector head (``SimplePedestrianDetector`` ``:160-230``).

    MLP feat->512->256->128->64->K*4, sigmoid coordinate ranges x:[0,360]
    y:[0,240] w:[15,95] h:[25,145]; the reference's Python filter loop becomes
    a validity mask, and its fallback box [180,120,30,60] is substituted into
    slot 0 of frames where no box passes.
    """

    cfg: FamilyAConfig

    # final-layer bias init: plausible pedestrian positions (reference
    # init_weights, causal_anomaly_detection.py:183-192)
    _BIAS = (180, 120, 25, 50, 150, 100, 20, 45, 210, 140, 30, 55,
             120, 80, 22, 48, 240, 160, 28, 52)

    @nn.compact
    def __call__(self, features: jnp.ndarray, *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.cfg.max_boxes
        dtype = _cdtype(self.cfg)
        h = MLP((512, 256, 128, 64), final_activation="relu",
                dropout_after=(0, 1), dropout_rates=(0.3, 0.2), dtype=dtype,
                name="detector_net")(features, deterministic=deterministic)
        bias = jnp.asarray(self._BIAS, jnp.float32)
        if k * 4 != len(self._BIAS):  # non-default K: tile/trim the pattern
            bias = jnp.resize(bias, (k * 4,))
        head = nn.Dense(k * 4, bias_init=lambda *_: bias, dtype=dtype,
                        name="detector_out")
        raw = head(h).reshape(features.shape[:-1] + (k, 4))
        x = nn.sigmoid(raw[..., 0]) * 360.0
        y = nn.sigmoid(raw[..., 1]) * 240.0
        w = nn.sigmoid(raw[..., 2]) * 80.0 + 15.0
        hh = nn.sigmoid(raw[..., 3]) * 120.0 + 25.0
        boxes = jnp.stack([x, y, w, hh], axis=-1)  # (B, T, K, 4)

        valid = ((x >= 10) & (x <= 350) & (y >= 10) & (y <= 230)
                 & (w >= 10) & (w <= 100) & (hh >= 20) & (hh <= 150))
        # fallback substitution (:224-226): frames with zero valid boxes get
        # the canonical fallback box in slot 0
        none_valid = ~valid.any(axis=-1)  # (B, T)
        fallback = jnp.array([180.0, 120.0, 30.0, 60.0], boxes.dtype)
        slot0 = jnp.where(none_valid[..., None], fallback, boxes[..., 0, :])
        boxes = boxes.at[..., 0, :].set(slot0)
        valid = valid.at[..., 0].set(valid[..., 0] | none_valid)
        return boxes, valid


class AnchorPedestrianDetector(nn.Module):
    """Earlier anchor-based detector head (``video_anomaly_detection.py:117-165``):
    bbox head feat -> K*4 raw coords, confidence head feat -> K sigmoid;
    validity = confidence > 0.5 with a zero dummy box when a frame has none."""

    cfg: FamilyAConfig
    num_anchors: int = 3

    @nn.compact
    def __call__(self, features: jnp.ndarray, *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.num_anchors
        dtype = _cdtype(self.cfg)
        boxes = nn.Dense(k * 4, dtype=dtype, name="bbox_head")(features)
        boxes = boxes.reshape(features.shape[:-1] + (k, 4))
        conf = nn.sigmoid(nn.Dense(k, dtype=dtype,
                                   name="conf_head")(features))  # (B, T, K)
        valid = conf > 0.5
        none_valid = ~valid.any(axis=-1)
        # dummy zero box in slot 0 when nothing passes (:160-161)
        slot0 = jnp.where(none_valid[..., None], jnp.zeros(4, boxes.dtype),
                          boxes[..., 0, :])
        boxes = boxes.at[..., 0, :].set(slot0)
        valid = valid.at[..., 0].set(valid[..., 0] | none_valid)
        return boxes, valid


class TrajectoryTracker(nn.Module):
    """Batched ReID (``:232-274``): MLP 4->32->D->D on every box, concat
    [box, reid] -> (B, T, K, 4+D), zeroed where invalid (the reference's zero
    padding)."""

    cfg: FamilyAConfig

    @nn.compact
    def __call__(self, boxes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        d = self.cfg.reid_dim
        dtype = _cdtype(self.cfg)
        h = nn.relu(nn.Dense(32, dtype=dtype, name="reid_0")(boxes))
        h = nn.relu(nn.Dense(d, dtype=dtype, name="reid_2")(h))
        h = nn.Dense(d, dtype=dtype, name="reid_4")(h)
        traj = jnp.concatenate([boxes, h], axis=-1)
        return traj * valid[..., None].astype(traj.dtype)


class TrajectoryEncoder(nn.Module):
    """GRU over time per trajectory slot (``:276-309``), as one scanned GRU
    over the folded (B*K, T, 4+D) tensor instead of per-trajectory calls."""

    cfg: FamilyAConfig

    @nn.compact
    def __call__(self, traj: jnp.ndarray) -> jnp.ndarray:
        b, t, k, d = traj.shape
        dtype = _cdtype(self.cfg)
        seq = jnp.transpose(traj, (0, 2, 1, 3)).reshape(b * k, t, d)
        cell = nn.GRUCell(features=self.cfg.gru_hidden, dtype=dtype)
        carry = cell.initialize_carry(jax.random.key(0), seq[:, 0].shape)
        scan = nn.scan(lambda c, carry, x: c(carry, x),
                       variable_broadcast="params", split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        h_last, _ = scan(cell, carry, seq)
        latent = nn.Dense(self.cfg.traj_latent, dtype=dtype,
                          name="encoder")(h_last)
        return latent.reshape(b, k, self.cfg.traj_latent)


class CausalFactorExtractor(nn.Module):
    """VAE head (``:311-352``) over (B, K, L): mu/logvar -> reparameterized
    factors + per-sample KL (masked mean over valid trajectories)."""

    cfg: FamilyAConfig

    @nn.compact
    def __call__(self, enc: jnp.ndarray, traj_valid: jnp.ndarray,
                 rng: Optional[jax.Array], *, sample: bool = True):
        f = self.cfg.num_factors
        dtype = _cdtype(self.cfg)
        h = nn.relu(nn.Dense(32, dtype=dtype, name="enc_0")(enc))
        h = nn.relu(nn.Dense(32, dtype=dtype, name="enc_2")(h))
        mu = nn.Dense(f, dtype=dtype, name="mu_head")(h)
        logvar = nn.Dense(f, dtype=dtype, name="logvar_head")(h)
        if sample and rng is not None:
            std = jnp.exp(0.5 * logvar)
            z = mu + jax.random.normal(rng, std.shape, std.dtype) * std
        else:
            z = mu  # deterministic eval path (parity is defined here, SURVEY.md §7)
        # KL accumulates in f32 regardless of compute dtype (exp/square of
        # bf16 logvar loses the loss signal's low bits)
        muf, lvf = mu.astype(jnp.float32), logvar.astype(jnp.float32)
        kl = -0.5 * jnp.sum(1 + lvf - muf**2 - jnp.exp(lvf), axis=-1)  # (B, K)
        m = traj_valid.astype(kl.dtype)
        kl_mean = (kl * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)  # (B,)
        z = z * m[..., None]
        return z, kl_mean


class CausalStructureLearner(nn.Module):
    """Edge model (``:354-398``): the reference's NxN double Python loop of
    1-row MLP calls becomes a single batched edge MLP over all (B, N, N)
    pairs.  Learnable `structure_params` kept for parity of surface."""

    cfg: FamilyAConfig

    @nn.compact
    def __call__(self, factors: jnp.ndarray, traj_valid: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = self.cfg.num_factors
        b, k, _ = factors.shape
        structure_params = self.param(
            "structure_params", nn.initializers.normal(1.0), (n, n))
        # pad/trim trajectory nodes to N=num_factors (reference indexes
        # adjacency by trajectory slot, capped at num_factors)
        if k < n:
            factors_n = jnp.pad(factors, ((0, 0), (0, n - k), (0, 0)))
            node_valid = jnp.pad(traj_valid, ((0, 0), (0, n - k)))
        else:
            factors_n = factors[:, :n]
            node_valid = traj_valid[:, :n]
        dtype = _cdtype(self.cfg)
        nodes = nn.Dense(32, dtype=dtype, name="node_encoder")(factors_n)  # (B, N, 32)
        pairs = jnp.concatenate(
            [jnp.broadcast_to(nodes[:, :, None], (b, n, n, 32)),
             jnp.broadcast_to(nodes[:, None, :], (b, n, n, 32))], axis=-1)
        e = nn.relu(nn.Dense(32, dtype=dtype, name="edge_0")(pairs))
        e = nn.sigmoid(nn.Dense(1, dtype=dtype, name="edge_2")(e))[..., 0]  # (B, N, N)
        mask = (node_valid[:, :, None] & node_valid[:, None, :]).astype(e.dtype)
        adj = e * mask * (1.0 - jnp.eye(n, dtype=e.dtype))
        return adj, jnp.broadcast_to(structure_params, (b, n, n))


class DynamicsPredictor(nn.Module):
    """Message pass + MLP (``:400-426``): structured = factors @ adj^T,
    batched as one einsum."""

    cfg: FamilyAConfig

    @nn.compact
    def __call__(self, factors: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        dtype = _cdtype(self.cfg)
        structured = jnp.einsum("bij,bkj->bki", adj.astype(dtype),
                                factors.astype(dtype))
        h = nn.relu(nn.Dense(32, dtype=dtype, name="dyn_0")(structured))
        h = nn.relu(nn.Dense(32, dtype=dtype, name="dyn_2")(h))
        return nn.Dense(self.cfg.num_factors, dtype=dtype, name="dyn_4")(h)


class EnhancedAnomalyScorer(nn.Module):
    """Three-head scorer (``:428-502``) on masked trajectory-mean factors;
    blend 0.5 causal + 0.3 motion + 0.2 temporal (:497)."""

    cfg: FamilyAConfig

    @nn.compact
    def __call__(self, factors: jnp.ndarray, predicted: jnp.ndarray,
                 node_valid: jnp.ndarray, *, deterministic: bool = True
                 ) -> jnp.ndarray:
        m = node_valid[:, :factors.shape[1], None].astype(factors.dtype)
        denom = jnp.maximum(m.sum(1), 1.0)
        cur = (factors * m).sum(1) / denom  # (B, F)
        pred = (predicted * m).sum(1) / denom
        diff = jnp.abs(cur - pred)

        dtype = _cdtype(self.cfg)
        causal = MLP((64, 32, 1), final_activation="sigmoid", dropout=0.2,
                     dropout_after=(0,), dtype=dtype, name="causal_scorer")(
                         jnp.concatenate([cur, pred, diff], -1),
                         deterministic=deterministic)
        motion = MLP((32, 16, 1), final_activation="sigmoid", dtype=dtype,
                     name="motion_scorer")(jnp.concatenate([cur, pred], -1))
        temporal = MLP((32, 16, 1), final_activation="sigmoid", dtype=dtype,
                       name="temporal_scorer")(cur)
        w = self.cfg.scorer_blend
        return (w[0] * causal + w[1] * motion + w[2] * temporal)[..., 0]


class SimpleAnomalyScorer(nn.Module):
    """Earlier single-head scorer (``video_anomaly_detection.py:375-403``):
    net 3F -> 32 -> 16 -> 1 sigmoid over cat[cur, pred, |diff|] applied PER
    trajectory node; the reference's ``score.mean()`` over its N packed
    trajectories becomes a masked mean over valid nodes — the same math on
    the reference-reachable patterns, fixed-shape here
    (tests/test_torch_parity_a0.py)."""

    cfg: FamilyAConfig

    @nn.compact
    def __call__(self, factors: jnp.ndarray, predicted: jnp.ndarray,
                 node_valid: jnp.ndarray, *, deterministic: bool = True
                 ) -> jnp.ndarray:
        x = jnp.concatenate([factors, predicted,
                             jnp.abs(factors - predicted)], -1)  # (B, N, 3F)
        s = MLP((32, 16, 1), final_activation="sigmoid",
                dtype=_cdtype(self.cfg), name="score_net")(x)[..., 0]  # (B, N)
        m = node_valid[:, :factors.shape[1]].astype(s.dtype)
        return (s * m).sum(1) / jnp.maximum(m.sum(1), 1.0)


class CausalPipelineDetector(nn.Module):
    """Full family-A assembly (``:508-586``): clip (B, T, H, W, 1) -> dict.

    Returns fixed-shape analogs of every reference output: final scores,
    factors (+trajectory mask), adjacency, KL, detections (+box mask), direct
    softmax predictions, and causal-only scores.
    """

    cfg: FamilyAConfig = FamilyAConfig()

    @nn.compact
    def __call__(self, clips: jnp.ndarray, *, rng: Optional[jax.Array] = None,
                 train: bool = False, deterministic: bool = True,
                 sample_valid: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        # optional rematerialization: recompute backbone activations in the
        # backward pass instead of keeping them in HBM (the big win at the
        # reference's full 240x360 frames; the reference instead shrank its
        # batch to 2-4 to fit GPU memory)
        backbone_cls = (nn.remat(ResNetBackbone, static_argnums=(2,))
                        if cfg.remat else ResNetBackbone)
        feats = backbone_cls(cfg, name="backbone")(clips, train, sample_valid)
        if cfg.anchor_variant:
            boxes, box_valid = AnchorPedestrianDetector(cfg, name="detector")(
                feats, deterministic=deterministic)
        else:
            boxes, box_valid = MaskedPedestrianDetector(cfg, name="detector")(
                feats, deterministic=deterministic)
        traj = TrajectoryTracker(cfg, name="tracker")(boxes, box_valid)
        traj_valid = box_valid.any(axis=1)  # (B, K): slot ever valid
        enc = TrajectoryEncoder(cfg, name="traj_encoder")(traj)
        factors, kl = CausalFactorExtractor(cfg, name="causal_extractor")(
            enc, traj_valid, rng, sample=not deterministic or train)
        adj, structure = CausalStructureLearner(cfg, name="structure_learner")(
            factors, traj_valid)
        # dynamics operates on N-node padded factors like the structure learner
        n = cfg.num_factors
        k = factors.shape[1]
        if k < n:
            factors_n = jnp.pad(factors, ((0, 0), (0, n - k), (0, 0)))
            node_valid = jnp.pad(traj_valid, ((0, 0), (0, n - k)))
        else:
            factors_n = factors[:, :n]
            node_valid = traj_valid[:, :n]
        predicted = DynamicsPredictor(cfg, name="dynamics_predictor")(factors_n, adj)
        scorer_cls = SimpleAnomalyScorer if cfg.anchor_variant else EnhancedAnomalyScorer
        causal_scores = scorer_cls(cfg, name="anomaly_scorer")(
            factors_n, predicted, node_valid, deterministic=deterministic)

        # score/KL outputs leave in f32 regardless of compute dtype: the
        # 4-term loss (ops/losses.py::family_a_loss) and eval thresholds
        # consume them, and the tensors are (B,)-tiny
        causal_scores = causal_scores.astype(jnp.float32)
        if cfg.direct_variant:
            pooled = feats.mean(axis=1)
            direct = MLP((512, 256, 128, 64, 2), final_activation="softmax",
                         dropout_after=(0, 1), dropout_rates=(0.3, 0.2),
                         dtype=_cdtype(cfg), name="direct_classifier")(
                             pooled, deterministic=deterministic)
            direct = direct.astype(jnp.float32)
            w0, w1 = cfg.score_blend
            final = w0 * causal_scores + w1 * direct[:, 1]
        else:
            # earlier variant has no direct head (video_anomaly_detection.py);
            # keep the output interface with a [1-s, s] stand-in
            final = causal_scores
            direct = jnp.stack([1.0 - causal_scores, causal_scores], axis=-1)
        return {
            "anomaly_scores": final,
            "causal_factors": factors,
            "trajectory_mask": traj_valid,
            "adjacency_matrices": adj,
            "structure_params": structure,
            "kl_losses": kl,
            "detections": boxes,
            "detection_mask": box_valid,
            "direct_predictions": direct,
            "causal_anomaly_scores": causal_scores,
        }
