"""Optimizers and learning-rate schedules.

Optax optimizer with `inject_hyperparams` so the learning rate is a traced
array inside the optimizer state: host-side schedulers mutate it between
epochs without retracing the compiled train step.  The schedulers reproduce
the reference's four torch schedules exactly (SURVEY.md §2.7):

- ReduceLROnPlateau(factor=.5, patience=5)  — family D (:128-130) / B (:353)
- CosineAnnealingLR                          — family A (:618-620)
- StepLR(15, 0.7)                            — family C (:237-240)
- constant                                   — Avenue driver v1
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from cvad_tpu.config import OptimConfig


def conditional_clip(trigger: float, clip_to: float
                     ) -> optax.GradientTransformation:
    """The reference family-C clip (``minicausal_vad_complete3.py:307-309``):
    gradients pass through UNTOUCHED unless their global norm exceeds
    `trigger`, and only then are rescaled to `clip_to`.  This is NOT
    ``clip_by_global_norm(clip_to)``, which rescales every gradient with
    norm above clip_to — on mid-training norms in (clip_to, trigger) the
    unconditional form shrinks updates up to trigger/clip_to x and measurably
    under-trains (AUC-parity study, round 3: family C reference 0.88 vs 0.65
    ours before this fix)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        scale = jnp.where(norm > trigger,
                          clip_to / jnp.maximum(norm, 1e-16), 1.0)
        return jax.tree_util.tree_map(lambda u: u * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """Grad-clip + Adam/AdamW with injected lr (reference recipes, §2.7)."""

    def make(learning_rate):
        if cfg.optimizer == "adamw":
            return optax.adamw(learning_rate, b1=cfg.b1, b2=cfg.b2,
                               weight_decay=cfg.weight_decay)
        if cfg.optimizer == "adam":
            if cfg.weight_decay > 0:
                # torch Adam(weight_decay=wd) couples L2 INTO the gradient
                # before the moment updates (families B/C: wd=1e-6/1e-5) —
                # unlike adamw's decoupled decay
                return optax.chain(
                    optax.add_decayed_weights(cfg.weight_decay),
                    optax.adam(learning_rate, b1=cfg.b1, b2=cfg.b2))
            return optax.adam(learning_rate, b1=cfg.b1, b2=cfg.b2)
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    tx = optax.inject_hyperparams(make)(learning_rate=cfg.lr)
    if cfg.grad_clip > 0:
        clip = (conditional_clip(cfg.clip_trigger, cfg.grad_clip)
                if cfg.clip_trigger > 0
                else optax.clip_by_global_norm(cfg.grad_clip))
        tx = optax.chain(clip, tx)
    return tx


def get_lr(opt_state) -> float:
    """Read the current injected learning rate out of the optimizer state."""
    for s in _iter_states(opt_state):
        hp = getattr(s, "hyperparams", None)
        if hp and "learning_rate" in hp:
            return float(hp["learning_rate"])
    raise ValueError("no injected learning_rate found in opt_state")


def set_lr(opt_state, lr: float):
    """Return a new opt_state with the injected learning rate replaced.

    Structure-preserving: recursion descends only plain chain tuples and
    wrapper states' ``inner_state`` (optax.masked, multi_transform, ...);
    NamedTuple states are rebuilt via ``_replace``, never flattened.
    """
    hp = getattr(opt_state, "hyperparams", None)
    if hp is not None and "learning_rate" in hp:
        new_hp = dict(hp)
        new_hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(hyperparams=new_hp)
    if hasattr(opt_state, "inner_state") and hasattr(opt_state, "_replace"):
        return opt_state._replace(inner_state=set_lr(opt_state.inner_state, lr))
    if type(opt_state) is tuple:  # chain state; excludes NamedTuples
        return tuple(set_lr(s, lr) for s in opt_state)
    return opt_state


def _iter_states(opt_state):
    if type(opt_state) is tuple:
        for s in opt_state:
            yield from _iter_states(s)
    elif hasattr(opt_state, "inner_state"):
        yield opt_state
        yield from _iter_states(opt_state.inner_state)
    else:
        yield opt_state


class HostScheduler:
    """Epoch-granular LR scheduler with exact torch semantics.

    `step(metric)` is called once per epoch (the reference calls its
    schedulers per epoch: ``avenue_training_script2.py:261``,
    ``minicausal_vad_complete3.py:240``); returns the new lr.
    """

    def __init__(self, cfg: OptimConfig, total_epochs: int = 0):
        self.cfg = cfg
        self.base_lr = cfg.lr
        self.lr = cfg.lr
        self.epoch = 0
        # plateau bookkeeping (torch ReduceLROnPlateau, mode='min',
        # threshold=1e-4 relative, no cooldown)
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.total_epochs = total_epochs

    def step(self, metric: Optional[float] = None) -> float:
        cfg = self.cfg
        self.epoch += 1
        if cfg.schedule == "constant":
            pass
        elif cfg.schedule == "plateau":
            if metric is not None and math.isfinite(metric):
                if self.best is None or metric < self.best * (1 - 1e-4):
                    self.best = metric
                    self.bad_epochs = 0
                else:
                    self.bad_epochs += 1
                    if self.bad_epochs > cfg.plateau_patience:
                        self.lr = self.lr * cfg.plateau_factor
                        self.bad_epochs = 0
        elif cfg.schedule == "step":
            if self.epoch % cfg.step_size == 0:
                self.lr = self.lr * cfg.step_gamma
        elif cfg.schedule == "cosine":
            t_max = cfg.cosine_steps or max(1, self.total_epochs)
            self.lr = 0.5 * self.base_lr * (1 + math.cos(math.pi * self.epoch / t_max))
        else:
            raise ValueError(f"unknown schedule {cfg.schedule!r}")
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "epoch": self.epoch, "best": self.best,
                "bad_epochs": self.bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.lr = d["lr"]
        self.epoch = d["epoch"]
        self.best = d["best"]
        self.bad_epochs = d["bad_epochs"]
