"""Reference-API compatibility layer.

Drop-in equivalents of the reference's trainer classes and drivers so code
written against the reference keeps working on this framework:

- `MiniCausalVAD` — the **missing module** `minicausal_vad` whose interface
  SURVEY.md §2.5 reconstructs from call sites
  (``avenue_training_script1.py:20,101,105,141,161,199``): ctor(device=),
  ``.model`` / ``.optimizer.param_groups`` / ``.device`` attributes,
  ``train_epoch(loader) -> (loss, components)``,
  ``evaluate(loader) -> (predictions, _, causal_graphs)``,
  ``save_model`` / ``load_model`` (torch .pth format).
- `ImprovedMiniCausalVAD` — ``avenue_training_script2.py:107-297``:
  ``train_epoch_improved`` (with the per-epoch plateau scheduler step),
  ``evaluate_improved -> (predictions, causal_graphs, eval_metrics)``.
- `create_unsupervised_labels` — ``avenue_training_script1.py:36-67``:
  95th-percentile pseudo-labels over model scores.
- `train_minicausal_vad_on_avenue` / `train_improved_minicausal_vad` — the
  two Avenue driver loops (v1 history schema with
  evaluation_scores/causal_sparsity/timestamps; v2 best-by-score_range).

Loaders may yield framework dict batches or reference-style
``(videos, labels)`` tuples in either layout; torch-layout (B, C, T, H, W)
clips are transposed automatically.
"""

from __future__ import annotations

import time
from datetime import datetime
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cvad_tpu.config import ExperimentConfig, preset
from cvad_tpu.evaluation.metrics import family_d_eval_metrics
from cvad_tpu.train.optim import HostScheduler, get_lr, set_lr
from cvad_tpu.train.tasks import build_task
from cvad_tpu.utils.json_utils import safe_json_save


def _to_framework_batch(item) -> Dict[str, np.ndarray]:
    if isinstance(item, dict):
        clips, labels = item["clips"], item["labels"]
    else:
        clips, labels = item
    clips = np.asarray(clips, np.float32)
    if clips.ndim == 5 and clips.shape[1] in (1, 3) and clips.shape[-1] not in (1, 3):
        clips = np.transpose(clips, (0, 2, 3, 4, 1))  # torch -> channels-last
    out = {"clips": clips, "labels": np.asarray(labels, np.float32).reshape(-1)}
    if isinstance(item, dict) and "pseudo_targets" in item:
        # injected pseudo-label stream (dynamics-parity studies): the
        # family-D task consumes it instead of its own RNG draw
        out["pseudo_targets"] = np.asarray(item["pseudo_targets"],
                                           np.float32).reshape(-1)
    return out


class _ParamGroup(dict):
    """torch-style param_group: writing 'lr' updates the real optimizer."""

    def __init__(self, owner: "MiniCausalVAD"):
        super().__init__(lr=owner._lr())
        self._owner = owner

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        if key == "lr":
            self._owner._set_lr(float(value))

    def __getitem__(self, key):
        if key == "lr":
            return self._owner._lr()
        return super().__getitem__(key)


class _OptimizerHandle:
    def __init__(self, owner: "MiniCausalVAD"):
        self._owner = owner

    @property
    def param_groups(self) -> List[_ParamGroup]:
        return [_ParamGroup(self._owner)]


class _ModelHandle:
    """Mimics the bits of the torch module the reference touches:
    ``model.model(videos)``, ``.eval()``, ``.train()``, ``.parameters()``,
    ``.state_dict()``."""

    def __init__(self, owner: "MiniCausalVAD"):
        self._owner = owner

    def __call__(self, videos):
        batch = _to_framework_batch((videos, np.zeros(len(videos))))
        out = self._owner._eval_step(batch)
        return (np.asarray(out["predictions"]).reshape(-1, 1),
                np.asarray(out["causal_graphs"]),
                np.asarray(out["features"]) if "features" in out else None)

    def eval(self):
        return self

    def train(self):
        return self

    def parameters(self):
        class _P:
            def __init__(self, a):
                self._a = a

            def numel(self):
                return int(np.asarray(self._a).size)

        if self._owner._state is not None:
            leaves = jax.tree_util.tree_leaves(self._owner._state.params)
        else:
            leaves = []
        return [_P(a) for a in leaves]

    def state_dict(self):
        from cvad_tpu.runtime.checkpoint import export_family_d_torch_state

        return export_family_d_torch_state(
            {"params": jax.device_get(self._owner._state.params)})


class MiniCausalVAD:
    """Reference-interface trainer over the framework's family-D task."""

    _HISTORY_SCHEDULER = False  # v1 trainer had no plateau scheduler calls

    def __init__(self, device: Optional[str] = None,
                 cfg: Optional[ExperimentConfig] = None):
        self.cfg = cfg or preset("family_d")
        self.task = build_task(self.cfg)
        self.device = device if device is not None else str(jax.devices()[0])
        self.scheduler = HostScheduler(self.cfg.optim)
        self._state = None
        self._key = jax.random.key(self.cfg.train.seed)
        self._train_fn = jax.jit(self.task.train_step)
        self._eval_fn = jax.jit(self.task.eval_step)
        self.model = _ModelHandle(self)
        self.optimizer = _OptimizerHandle(self)

    # -- internals -----------------------------------------------------------

    def _ensure_state(self, batch: Dict[str, np.ndarray]) -> None:
        if self._state is None:
            self._state = self.task.init_state(
                jax.random.key(self.cfg.train.seed),
                {k: jnp.asarray(v) for k, v in batch.items()})

    def _eval_step(self, batch):
        self._ensure_state(batch)
        return jax.device_get(self._eval_fn(self._state, batch))

    def _lr(self) -> float:
        if self._state is None:
            return self.cfg.optim.lr
        return get_lr(self._state.opt_state)

    def _set_lr(self, lr: float) -> None:
        self.scheduler.lr = lr
        self.scheduler.base_lr = lr
        if self._state is not None:
            self._state = self._state.replace(
                opt_state=set_lr(self._state.opt_state, lr))

    # -- reference API -------------------------------------------------------

    def train_epoch(self, dataloader: Iterable) -> Tuple[float, Dict[str, float]]:
        # metrics accumulate ON DEVICE; one host fetch per epoch.  A per-batch
        # jax.device_get costs a ~30ms D2H round trip through the relay, which
        # made the compat drivers 10x+ slower than the Trainer for no reason.
        acc: Optional[Dict[str, jnp.ndarray]] = None
        count = 0
        for item in dataloader:
            batch = _to_framework_batch(item)
            self._ensure_state(batch)
            self._state, metrics = self._train_fn(self._state, batch, self._key)
            acc = metrics if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, metrics)
            count += 1
        n = max(count, 1)
        host = ({k: float(v) for k, v in jax.device_get(acc).items()}
                if acc is not None else {})
        loss_sum = host.pop("loss", 0.0)
        return loss_sum / n, {k: v / n for k, v in host.items()}

    def evaluate(self, dataloader: Iterable):
        preds: List[np.ndarray] = []
        graphs: List[np.ndarray] = []
        for item in dataloader:
            out = self._eval_step(_to_framework_batch(item))
            preds.append(np.asarray(out["predictions"]).reshape(-1))
            graphs.append(np.asarray(out["causal_graphs"]))
        predictions = np.concatenate(preds) if preds else np.zeros(0)
        causal_graphs = (np.concatenate(graphs) if graphs
                         else np.zeros((0, 16, 16)))
        return predictions, None, causal_graphs

    def save_model(self, path: str) -> None:
        import torch

        torch.save({"model_state_dict": {
            k: torch.from_numpy(np.array(v, copy=True))
            for k, v in self.model.state_dict().items()}}, path)

    def load_model(self, path: str) -> None:
        from cvad_tpu.runtime.checkpoint import import_torch_family_d

        variables = import_torch_family_d(path)
        if self._state is None:
            dummy = {"clips": np.zeros((1, 8, 64, 64, 3), np.float32),
                     "labels": np.zeros(1, np.float32)}
            self._ensure_state(dummy)
        self._state = self._state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, variables["params"]))


class ImprovedMiniCausalVAD(MiniCausalVAD):
    """``avenue_training_script2.py:107-297`` interface: plateau scheduler
    stepped per epoch on the average loss; 8-metric eval dict."""

    def __init__(self, device: Optional[str] = None,
                 cfg: Optional[ExperimentConfig] = None):
        super().__init__(device, cfg or preset("avenue_improved"))
        self.anomaly_weight = self.cfg.loss.anomaly_weight
        self.causal_weight = self.cfg.loss.causal_weight
        self.sparsity_weight = self.cfg.loss.sparsity_weight
        self.consistency_weight = self.cfg.loss.consistency_weight

    def compute_improved_loss(self, anomaly_scores, causal_adj, targets,
                              features=None):
        from cvad_tpu.ops.losses import improved_loss

        total, comps = improved_loss(jnp.asarray(anomaly_scores),
                                     jnp.asarray(causal_adj),
                                     jnp.asarray(np.asarray(targets).reshape(-1)),
                                     self.cfg.loss)
        return float(total), {k: float(v) for k, v in comps.items()}

    def train_epoch_improved(self, dataloader: Iterable):
        avg_loss, comps = self.train_epoch(dataloader)
        new_lr = self.scheduler.step(avg_loss)  # ReduceLROnPlateau (:261)
        if self._state is not None:
            self._state = self._state.replace(
                opt_state=set_lr(self._state.opt_state, new_lr))
        return avg_loss, comps

    def evaluate_improved(self, dataloader: Iterable):
        predictions, _, causal_graphs = self.evaluate(dataloader)
        eval_metrics = family_d_eval_metrics(predictions, causal_graphs,
                                             self.cfg.loss.edge_threshold)
        return predictions, causal_graphs, eval_metrics


def create_unsupervised_labels(test_loader: Iterable, model: MiniCausalVAD,
                               threshold_percentile: float = 95):
    """95th-percentile pseudo-labels (``avenue_training_script1.py:36-67``)."""
    all_scores: List[float] = []
    for item in test_loader:
        batch = _to_framework_batch(item)
        scores, _, _ = model.model(batch["clips"])
        all_scores.extend(np.asarray(scores).reshape(-1).tolist())
    all_scores = np.asarray(all_scores)
    threshold = float(np.percentile(all_scores, threshold_percentile))
    pseudo = (all_scores > threshold).astype(float)
    return all_scores, pseudo, threshold


def train_minicausal_vad_on_avenue(dataset_path: str, num_epochs: int = 50,
                                   batch_size: int = 4,
                                   learning_rate: float = 0.001,
                                   save_interval: int = 10,
                                   output_dir: str = "avenue_training_results",
                                   loaders=None):
    """Avenue driver v1 (``avenue_training_script1.py:69-226``): v1 history
    schema, eval every 5 epochs, pseudo-labels, best-by-mean-score."""
    from cvad_tpu.data.datasets import create_avenue_dataloaders

    train_loader, test_loader = (loaders if loaders is not None else
                                 create_avenue_dataloaders(
                                     dataset_path, batch_size=batch_size))
    model = MiniCausalVAD()
    if learning_rate != 0.001:
        for pg in model.optimizer.param_groups:
            pg["lr"] = learning_rate

    history = {"train_losses": [], "loss_components": [],
               "evaluation_scores": [], "causal_sparsity": [],
               "epochs": [], "timestamps": []}
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    start = time.time()
    best_score = 0.0
    for epoch in range(num_epochs):
        train_loss, comps = model.train_epoch(train_loader)
        history["train_losses"].append(train_loss)
        history["loss_components"].append(comps)
        history["epochs"].append(epoch + 1)
        history["timestamps"].append(datetime.now().isoformat())
        if epoch % 5 == 0 or epoch == num_epochs - 1:
            predictions, _, causal_graphs = model.evaluate(test_loader)
            eval_score = float(np.mean(predictions)) if len(predictions) else train_loss
            avg_edges = float(np.mean((causal_graphs > 0.1).sum(axis=(1, 2)))) \
                if len(causal_graphs) else 0.0
            sparsity = avg_edges / (causal_graphs.shape[1] ** 2) \
                if len(causal_graphs) else 0.0
            history["evaluation_scores"].append(eval_score)
            history["causal_sparsity"].append(sparsity)
            if eval_score > best_score:
                best_score = eval_score
                model.save_model(str(out / "best_model.pth"))
        if epoch % save_interval == 0:
            model.save_model(str(out / f"checkpoint_epoch_{epoch}.pth"))
        safe_json_save(history, out / "training_history.json", verbose=False)
    return model, history


def train_improved_minicausal_vad(dataset_path: str, num_epochs: int = 100,
                                  batch_size: int = 4, save_interval: int = 20,
                                  output_dir: str = "improved_avenue_results",
                                  loaders=None):
    """Avenue driver v2 (``avenue_training_script2.py:339-468``): v2 history
    schema, eval every 5 epochs, best-by-score_range."""
    from cvad_tpu.data.datasets import create_avenue_dataloaders

    train_loader, test_loader = (loaders if loaders is not None else
                                 create_avenue_dataloaders(
                                     dataset_path, batch_size=batch_size))
    model = ImprovedMiniCausalVAD()
    history = {"train_losses": [], "loss_components": [],
               "evaluation_metrics": [], "epochs": [], "learning_rates": []}
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    best_score_range = 0.0
    for epoch in range(num_epochs):
        train_loss, comps = model.train_epoch_improved(train_loader)
        history["train_losses"].append(train_loss)
        history["loss_components"].append(comps)
        history["epochs"].append(epoch + 1)
        history["learning_rates"].append(model.optimizer.param_groups[0]["lr"])
        if epoch % 5 == 0 or epoch == num_epochs - 1:
            _, _, eval_metrics = model.evaluate_improved(test_loader)
            history["evaluation_metrics"].append(eval_metrics)
            if eval_metrics["score_range"] > best_score_range:
                best_score_range = eval_metrics["score_range"]
                model.save_model(str(out / "best_improved_model.pth"))
        if epoch % save_interval == 0:
            model.save_model(str(out / f"checkpoint_epoch_{epoch}.pth"))
        safe_json_save(history, out / "improved_training_history.json",
                       verbose=False)
    return model, history


def setup_training_environment():
    """Device probe (``avenue_training_script1.py:23-35``): the reference
    returned the torch device after printing GPU name/memory and clearing
    the cache.  Here the analog is the default jax device — there is no
    cache to clear (XLA arena allocation) — returned as the object the
    drivers pass to ``MiniCausalVAD(device=...)``."""
    dev = jax.devices()[0]
    print(f"Using device: {dev.platform}:{dev.id} ({dev.device_kind})")
    return dev


def test_trained_model(model_path: str, dataset_path: str,
                       loaders=None):
    """Post-training evaluation driver (``avenue_training_script1.py:293-313``):
    load a checkpoint into `MiniCausalVAD`, evaluate on the Avenue test
    split, return ``(predictions, causal_graphs)``."""
    from cvad_tpu.data.datasets import create_avenue_dataloaders

    _, test_loader = (loaders if loaders is not None else
                      create_avenue_dataloaders(dataset_path, batch_size=4))
    model = MiniCausalVAD(device=str(setup_training_environment()))
    model.load_model(model_path)
    predictions, _, causal_graphs = model.evaluate(test_loader)
    avg_edges = float(np.mean((causal_graphs > 0.1).sum(axis=(1, 2)))) \
        if len(causal_graphs) else 0.0
    print(f"Predictions: {predictions.shape}, range "
          f"[{predictions.min():.4f}, {predictions.max():.4f}], "
          f"avg causal edges {avg_edges:.1f}")
    return predictions, causal_graphs


test_trained_model.__test__ = False  # reference-named API, not a pytest test
