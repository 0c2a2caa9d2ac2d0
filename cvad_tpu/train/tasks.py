"""Per-family training/eval step definitions.

Each task turns a (model config, loss config, optim config) triple into pure
jittable `train_step(state, batch, rng)` / `eval_step(state, batch)` functions
plus an initializer.  The engine (`cvad_tpu.train.engine`) jits them once over
the device mesh; the reference's five hand-written training loops (SURVEY.md
§2.7) all collapse into these step definitions.

Batches are dicts: ``{"clips": (B, T, H, W, C) f32, "labels": (B,) f32}``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import re

import jax
import jax.numpy as jnp
import optax

from cvad_tpu.config import (ExperimentConfig, FamilyAConfig, FamilyBConfig,
                             FamilyCConfig, FamilyDConfig, LossConfig)
from cvad_tpu.models import build_model
from cvad_tpu.models.family_b import init_memory
from cvad_tpu.ops.losses import (binary_cross_entropy, family_a_loss,
                                 improved_loss, pseudo_labels)
from cvad_tpu.train.optim import build_optimizer
from cvad_tpu.train.state import TrainState, make_state


class Task:
    """Bundle of model + step functions for one family."""

    def __init__(self, model, tx, init_state, train_step, eval_step):
        self.model = model
        self.tx = tx
        self.init_state = init_state
        self.train_step = train_step
        self.eval_step = eval_step


def _masked_mean_1d(x: jnp.ndarray, valid: jnp.ndarray | None) -> jnp.ndarray:
    """Mean of a per-sample vector, excluding DP-padding rows."""
    if valid is None:
        return jnp.mean(x)
    return jnp.sum(x * valid) / jnp.maximum(valid.sum(), 1.0)


def prep_clips(clips: jnp.ndarray, clamp=(0.0, 1.0)) -> jnp.ndarray:
    """Device-side input normalization: uint8 batches (the low-bandwidth
    host->device transfer path, 4x fewer bytes) become [0,1] float32 on
    device; the family-B clamp applies either way."""
    if clips.dtype == jnp.uint8:
        clips = clips.astype(jnp.float32) / 255.0
    lo, hi = clamp
    if (lo, hi) != (0.0, 1.0):
        clips = jnp.clip(clips, lo, hi)
    return clips


def _with_prepped_clips(batch, clamp):
    return {**batch, "clips": prep_clips(batch["clips"], clamp)}


def _apply_updates(state: TrainState, tx, grads, loss,
                   new_model_state: Dict[str, Any] | None = None,
                   extra=None) -> TrainState:
    """Clip+optimizer update with the NaN-skip guard (SURVEY.md §5 sanitizers):
    a non-finite loss or gradient leaves params/opt-state untouched, exactly
    like the reference's `continue`-on-NaN batches."""
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    gnorm = optax.global_norm(grads)
    ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)

    def keep(new, old):
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old)

    return TrainState(
        params=keep(new_params, state.params),
        opt_state=keep(new_opt, state.opt_state),
        step=state.step + 1,
        batch_stats=(new_model_state or {}).get("batch_stats", state.batch_stats),
        extra=extra if extra is not None else state.extra,
    )


# ---------------------------------------------------------------------------
# Family D (flagship) — avenue_training_script2.py recipe
# ---------------------------------------------------------------------------


def _family_d_task(cfg: ExperimentConfig) -> Task:
    model_cfg = cfg.model
    if cfg.train.dtype != "float32" and model_cfg.dtype == "float32":
        model_cfg = model_cfg.replace(dtype=cfg.train.dtype)
    model = build_model(model_cfg)
    tx = build_optimizer(cfg.optim)
    loss_cfg = cfg.loss

    def init_state(rng, sample_batch) -> TrainState:
        variables = model.init(rng, sample_batch["clips"])
        return make_state(variables["params"], tx)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        batch = _with_prepped_clips(batch, cfg.data.normalize_clamp)
        valid = batch.get("valid")  # DP remainder padding mask (or None)
        rng = jax.random.fold_in(rng, state.step)
        r_drop, r_pseudo = jax.random.split(rng)
        if "pseudo_targets" in batch:
            # injected label stream: dynamics-parity studies feed the torch
            # reference and this engine ONE shared pseudo-label sequence so
            # the anomaly-term trajectories are comparable under matched
            # noise (the reference's own draws are unseeded torch.rand_like,
            # avenue_training_script2.py:139-141)
            targets = batch["pseudo_targets"]
        else:
            targets = pseudo_labels(r_pseudo, batch["clips"].shape[0],
                                    loss_cfg.pseudo_anomaly_rate)

        def loss_fn(params):
            scores, adj, feats = model.apply(
                {"params": params}, batch["clips"], deterministic=False,
                rngs={"dropout": r_drop})
            total, comps = improved_loss(scores, adj, targets, loss_cfg,
                                         valid=valid)
            return total, comps

        (loss, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads, loss)
        metrics = {"loss": loss, **comps}
        return new_state, metrics

    def eval_step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        batch = _with_prepped_clips(batch, cfg.data.normalize_clamp)
        scores, adj, feats = model.apply({"params": state.params},
                                         batch["clips"], deterministic=True)
        return {"predictions": scores.reshape(-1), "causal_graphs": adj,
                "features": feats}

    return Task(model, tx, init_state, train_step, eval_step)


# ---------------------------------------------------------------------------
# Family C — minicausal_vad_complete3.py StableTrainer recipe
# ---------------------------------------------------------------------------


def _family_c_task(cfg: ExperimentConfig) -> Task:
    mcfg = cfg.model
    if cfg.train.dtype != "float32" and mcfg.dtype == "float32":
        mcfg = mcfg.replace(dtype=cfg.train.dtype)
    model = build_model(mcfg)
    tx = build_optimizer(cfg.optim)

    def init_state(rng, sample_batch) -> TrainState:
        variables = model.init(rng, sample_batch["clips"], train=True)
        return make_state(variables["params"], tx,
                          batch_stats=variables["batch_stats"])

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        batch = _with_prepped_clips(batch, cfg.data.normalize_clamp)
        rng = jax.random.fold_in(rng, state.step)

        valid = batch.get("valid")

        def loss_fn(params):
            # conv_{i} biases feed straight into BatchNorm3d — analytically
            # zero gradients (see stop_bn_absorbed_biases)
            params = stop_bn_absorbed_biases(params)
            scores, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["clips"], train=True, deterministic=False, valid=valid,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            # `valid` excludes DP-padding rows from both the BN batch
            # statistics (MaskedBatchNorm) and the loss mean
            loss = _masked_mean_1d(
                binary_cross_entropy(scores.reshape(-1), batch["labels"]),
                valid)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads, loss, mutated)
        return new_state, {"loss": loss}

    def eval_step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        batch = _with_prepped_clips(batch, cfg.data.normalize_clamp)
        scores = model.apply(state.variables(), batch["clips"],
                             train=False, deterministic=True)
        scores = scores.reshape(-1)
        # per-sample loss vector: the engine trims DP-padding rows before
        # averaging, so padded eval batches don't bias the reported loss
        loss = binary_cross_entropy(scores, batch["labels"])
        return {"predictions": scores, "labels": batch["labels"], "loss": loss}

    return Task(model, tx, init_state, train_step, eval_step)


# ---------------------------------------------------------------------------
# Family B — causal_anomaly_detection1.py normal-only AE recipe
# ---------------------------------------------------------------------------


def _family_b_task(cfg: ExperimentConfig) -> Task:
    mcfg: FamilyBConfig = cfg.model
    if cfg.train.dtype != "float32" and mcfg.dtype == "float32":
        mcfg = mcfg.replace(dtype=cfg.train.dtype)
    model = build_model(mcfg)
    tx = build_optimizer(cfg.optim)
    loss_cfg: LossConfig = cfg.loss

    def init_state(rng, sample_batch) -> TrainState:
        mem = init_memory(mcfg.memory_size, mcfg.latent_dim)
        variables = model.init(rng, sample_batch["clips"], mem, train=True)
        return make_state(variables["params"], tx,
                          batch_stats=variables["batch_stats"], extra=mem)

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        # Fold (B,T,...) -> (B*T,...) at the top: the encoder trains through
        # model.folded_forward and the recon loss consumes only per-sample
        # moments, so the big tensors in the graph are the folded frames and
        # the encoder activations.  The ~0.5 ms/step of input relayout
        # copies that remain are the input param -> conv layout transition;
        # pinning XLA's own auto-preferred input layout (major_to_minor
        # (0,1,4,2,3)) measured 2.7x SLOWER end-to-end — layout lottery, see
        # PARITY.md family-B trace note.
        clips_u8 = batch["clips"]
        b, t = clips_u8.shape[0], clips_u8.shape[1]
        # No optimization_barrier on the fold anymore.  History (full-step
        # traces, B=256 bf16): with the OLD repeat-diff loss, barrier-on-u8
        # was a ~0.5 ms win (it kept the relayout copies in u8).  With the
        # sufficient-statistics loss below, the A/B flipped — barrier 4,903
        # vs no-barrier 4,749 us/step (runs/traces_r3/prof_famb_r3_v3/v4b):
        # letting XLA commute the convert above the reshape lets the
        # x-moment reductions share the one bf16 5-D view instead of paying
        # a second u8 read path.  Layout decisions are a lottery across
        # graph perturbations — re-trace before touching this.
        folded_u8 = clips_u8.reshape((b * t,) + clips_u8.shape[2:])
        flat = prep_clips(folded_u8, cfg.data.normalize_clamp)
        # Data-side moments for the sufficient-statistics recon loss: pure
        # reductions off the (B,T,...) batch view, NOT off the folded float
        # tensor — reshaping `flat` back to 5-D forced XLA to materialize a
        # full f32 copy (+900 us/step, round-3 trace v2).  stop_gradient is
        # structural truth (data, not params).
        x5 = prep_clips(batch["clips"], cfg.data.normalize_clamp)
        x_mean = jax.lax.stop_gradient(x5.mean(axis=1))
        x_sqmean = jax.lax.stop_gradient(
            jnp.mean(x5 * x5, axis=(1, 2, 3, 4)))
        normal = (batch["labels"] == 0).astype(jnp.float32)  # (:374-378)
        if "valid" in batch:  # DP padding rows: never train on or memorize
            normal = normal * batch["valid"]
        n_normal = normal.sum()

        def loss_fn(params):
            params = stop_bn_absorbed_biases(params)
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                flat, state.extra, t=t, train=True,
                valid=batch.get("valid"), mutable=["batch_stats"],
                method="folded_forward")
            # per-sample recon error, averaged over normal samples only.
            # Same math as mean((recon - clips)^2, axis=(1,2,3,4)) — the
            # decode is one frame broadcast over T (reference :248-260) —
            # via the sufficient-statistics identity
            #   E_t[(f - x_t)^2] = f^2 - 2 f x_bar + E_t[x^2].
            # The x-side moments are functions of DATA only, so the big
            # (B*T,H,W,C) tensor is read once in one fused fwd reduction and
            # the backward touches nothing larger than the (B,H,W,C) frame —
            # the old diff formulation materialized repeat(frame,T), a
            # (B*T,H,W) diff^2 pass, AND their backward broadcasts (~450
            # us/step of pure HBM traffic at B=256, round-3 trace
            # runs/traces_r3/prof_famb_r3.log: broadcast.35 + copy.255/216 +
            # multiply_reduce pair).
            frame = jnp.clip(out["recon_frame"], 1e-8, 1 - 1e-8)
            frame = frame.astype(jnp.float32)
            fm = jnp.mean(frame * frame, axis=(1, 2, 3))
            fx = jnp.mean(frame * x_mean, axis=(1, 2, 3))
            err = fm - 2.0 * fx + x_sqmean
            loss = (err * normal).sum() / jnp.maximum(n_normal, 1.0)
            loss = loss * loss_cfg.b_recon_weight
            return loss, (mutated, out)

        (loss, (mutated, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # memory update with normal features only (reference :407 updates per
        # step with the batch's normal features)
        mem = update_memory_masked(state.extra, out["sequence_feature"], normal)
        new_state = _apply_updates(state, tx, grads, loss, mutated, extra=mem)
        return new_state, {"loss": loss, "n_normal": n_normal}

    def eval_step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        batch = _with_prepped_clips(batch, cfg.data.normalize_clamp)
        out = model.apply(state.variables(), batch["clips"], state.extra,
                          train=False)
        recon_err = jnp.mean((out["reconstructed"] - batch["clips"]) ** 2,
                             axis=(1, 2, 3, 4))
        mem_score = out["anomaly_score"]
        combined = (loss_cfg.b_score_recon * recon_err
                    + loss_cfg.b_score_memory * mem_score)  # (:552)
        return {"predictions": combined, "recon_errors": recon_err,
                "memory_scores": mem_score, "labels": batch["labels"],
                "loss": recon_err}  # per-sample; engine trims padding rows

    return Task(model, tx, init_state, train_step, eval_step)


def update_memory_masked(state, feats, mask):
    """Write only masked rows into the ring buffer, preserving FIFO order:
    valid rows are packed first (stable sort), the pointer advances by the
    valid count."""
    b = feats.shape[0]
    order = jnp.argsort(~mask.astype(bool), stable=True)
    feats_sorted = feats[order]
    k = mask.sum().astype(jnp.int32)
    m = state.memory.shape[0]
    idx = (state.ptr + jnp.arange(b, dtype=jnp.int32)) % m
    valid_write = jnp.arange(b) < k
    current = state.memory[idx]
    new_rows = jnp.where(valid_write[:, None],
                         jax.lax.stop_gradient(feats_sorted), current)
    memory = state.memory.at[idx].set(new_rows)
    from cvad_tpu.models.family_b import MemoryBankState

    return MemoryBankState(memory=memory, ptr=(state.ptr + k) % m,
                           fill=jnp.minimum(state.fill + k, m))


# ---------------------------------------------------------------------------
# Family A — causal_anomaly_detection.py recipe
# ---------------------------------------------------------------------------


def _is_frozen(path) -> bool:
    """Family-A frozen-stem predicate: backbone conv1/bn1 leaves."""
    keys = [getattr(k, "key", "") for k in path]
    return "backbone" in keys and any(k in ("conv1", "bn1") for k in keys)


def stop_frozen_stem(params):
    """requires_grad=False semantics (apply_memory_efficient_training,
    causal_anomaly_detection.py:592-607): no gradient is COMPUTED for
    conv1/bn1 at all.  This matters beyond the update math (which
    optax.masked(set_to_zero) already handled): `_apply_updates`'s NaN-skip
    guard takes `optax.global_norm(grads)` over the WHOLE grad tree, so the
    frozen grads survived dead-code elimination just to feed that scalar —
    the stem backward (conv1 wgrad at C_in=1, bn1 bwd, and the maxpool
    select-and-scatter) cost ~14 ms of a 30 ms step at 240x360 frames.
    Structurally-zero frozen grads make the guard's norm — like torch, where
    no-grad params never have a .grad to inspect — a trainable-only norm,
    and let XLA delete the stem backward entirely."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: jax.lax.stop_gradient(v) if _is_frozen(path) else v,
        params)


_BN_ABSORBED = re.compile(r"^(conv_\d|deconv_\d|layer\d_conv\d)$")


def _is_bn_absorbed_bias(path) -> bool:
    """Bias leaves of conv modules that feed straight into BatchNorm.

    Name patterns per family (each verified conv->BN in the reference):
    ``conv_{i}``/``deconv_{i}`` — family B encoder/decoder
    (causal_anomaly_detection1.py:129-178; ``deconv_out`` feeds a sigmoid
    and is excluded by the pattern) and family C's 3-D tower
    (minicausal_vad_complete3.py:38-55); ``layer{N}_conv{M}`` — family A's
    backbone stages (causal_anomaly_detection.py:128-139; the stem conv1
    is already frozen by requires_grad parity)."""
    keys = {getattr(k, "key", None) for k in path}
    if "bias" not in keys:
        return False
    return any(isinstance(k, str) and _BN_ABSORBED.match(k) for k in keys)


def stop_bn_absorbed_biases(params):
    """Zero-cost gradients for conv biases that BatchNorm absorbs.

    Every reference encoder conv / decoder deconv keeps torch's default
    ``bias=True`` and is immediately followed by ``BatchNorm2d``
    (``causal_anomaly_detection1.py:129-178``) — the batch-mean subtraction
    makes the training loss exactly invariant to those biases, so their true
    gradient is analytically zero (torch computes FP noise at ~1e-8 and
    Adam random-walks the dead parameter; the bias still shifts BN's
    *batch statistics*, which this keeps — only the gradient is
    structurally zeroed).  Worth real bandwidth: the conv_0 bias grad alone
    was a standalone 134 MB reduction pass, 359 us/step at B=256
    (runs/traces_r3/prof_famb_r3.log %fusion.430).  ``deconv_out`` feeds a
    sigmoid, not a BN — its bias is live and excluded."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: (jax.lax.stop_gradient(v)
                         if _is_bn_absorbed_bias(path) else v),
        params)


def _family_a_task(cfg: ExperimentConfig) -> Task:
    mcfg = cfg.model
    if cfg.train.dtype != "float32" and mcfg.dtype == "float32":
        mcfg = mcfg.replace(dtype=cfg.train.dtype)
    model = build_model(mcfg)
    tx = build_optimizer(cfg.optim)

    if cfg.model.freeze_stem:
        # freeze backbone conv1/bn1 params (the reference's
        # apply_memory_efficient_training, causal_anomaly_detection.py:592-607);
        # BN running stats still update via batch_stats, exactly like torch
        def trainable(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: not _is_frozen(path), params)

        def frozen(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: _is_frozen(path), params)

        # optax.masked passes unmasked updates through unchanged, so zero the
        # frozen leaves explicitly — requires_grad=False semantics
        tx = optax.chain(optax.masked(optax.set_to_zero(), frozen),
                         optax.masked(tx, trainable))
    loss_cfg = cfg.loss

    def init_state(rng, sample_batch) -> TrainState:
        variables = model.init(rng, sample_batch["clips"], train=True)
        return make_state(variables["params"], tx,
                          batch_stats=variables["batch_stats"])

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        batch = _with_prepped_clips(batch, cfg.data.normalize_clamp)
        rng = jax.random.fold_in(rng, state.step)
        r_vae, r_drop = jax.random.split(rng)

        def loss_fn(params):
            if cfg.model.freeze_stem:
                params = stop_frozen_stem(params)
            # layer{N}_conv{M} biases feed straight into BatchNorm2d —
            # analytically zero gradients, and at 240x360 frames each
            # standalone bias-grad reduction is a full pass over a
            # 40-350 MB activation (see stop_bn_absorbed_biases)
            params = stop_bn_absorbed_biases(params)
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["clips"], rng=r_vae, train=True, deterministic=False,
                sample_valid=batch.get("valid"),
                rngs={"dropout": r_drop}, mutable=["batch_stats"])
            loss, comps = family_a_loss(out, batch["labels"], loss_cfg,
                                        valid=batch.get("valid"))
            return loss, (mutated, comps)

        (loss, (mutated, comps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads, loss, mutated)
        return new_state, {"loss": loss, **comps}

    def eval_step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        batch = _with_prepped_clips(batch, cfg.data.normalize_clamp)
        out = model.apply(state.variables(), batch["clips"], train=False,
                          deterministic=True)
        return {"predictions": out["anomaly_scores"],
                "causal_scores": out["causal_anomaly_scores"],
                "direct_predictions": out["direct_predictions"],
                "causal_graphs": out["adjacency_matrices"],
                "labels": batch["labels"]}

    return Task(model, tx, init_state, train_step, eval_step)


# ---------------------------------------------------------------------------


def build_task(cfg: ExperimentConfig) -> Task:
    table: Dict[type, Callable[[ExperimentConfig], Task]] = {
        FamilyDConfig: _family_d_task,
        FamilyCConfig: _family_c_task,
        FamilyBConfig: _family_b_task,
        FamilyAConfig: _family_a_task,
    }
    fn = table.get(type(cfg.model))
    if fn is None:
        raise KeyError(
            f"no training task for {type(cfg.model).__name__} "
            "(family E is inference-only, as in the reference)")
    return fn(cfg)
