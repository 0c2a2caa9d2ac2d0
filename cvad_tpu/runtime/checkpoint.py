"""Checkpoint manager + PyTorch-checkpoint importer.

Replaces the reference's ad-hoc ``torch.save`` zoo (SURVEY.md §5
"Checkpoint / resume": four distinct formats across the scripts, loading
tolerant of all of them at ``avenue_training_script_bbox.py:131-141``) with a
single orbax-backed manager that saves params + optimizer state + step +
extra state (e.g. the family-B memory bank) + training history, supports
async save, and can restore mid-training — which the reference never could.

`import_torch_family_d` converts the shipped ``best_improved_model.pth`` into
framework params for the score-parity check (BASELINE.md north star).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np

from cvad_tpu.utils.json_utils import safe_json_load, safe_json_save


class CheckpointManager:
    """Orbax-backed checkpoints: one directory per step, plus 'best'."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _step_dir(self, step) -> Path:
        return self.directory / (step if isinstance(step, str) else f"step_{step:08d}")

    def save(self, step, state: Any, history: Optional[Mapping] = None,
             wait: bool = False) -> Path:
        path = self._step_dir(step)
        # an async save of the SAME step may still be committing — settle it
        # so the existence check below can't race (orbax refuses to save over
        # an existing directory)
        self._ckptr.wait_until_finished()
        if path.exists():
            # crash-safe overwrite (the rolling 'mid' preemption snapshot is
            # rewritten every save_every_steps): serialize the NEW checkpoint
            # fully into a sibling tmp dir first, then swap with two renames.
            # Deleting the old one before the (multi-second) serialize would
            # open a window where a preemption loses BOTH snapshots — the
            # exact event 'mid' exists to survive.
            import shutil

            # "_tmp."/"_old." PREFIXES: suffixed names would match the
            # step_* glob and break latest_step()/_gc()
            tmp = path.with_name("_tmp." + path.name)
            old = path.with_name("_old." + path.name)
            for p in (tmp, old):
                if p.exists():
                    shutil.rmtree(p)
            self._ckptr.save(tmp, state)
            self._ckptr.wait_until_finished()
            if history is not None:
                safe_json_save(dict(history), tmp / "history.json",
                               verbose=False)
            path.rename(old)
            tmp.rename(path)  # crash between renames: falls back to epoch ckpt
            shutil.rmtree(old, ignore_errors=True)
            self._gc()
            return path
        self._ckptr.save(path, state)
        if wait:
            self._ckptr.wait_until_finished()
        if history is not None:
            self._ckptr.wait_until_finished()
            safe_json_save(dict(history), path / "history.json", verbose=False)
        self._gc()
        return path

    def restore(self, step, template: Any) -> Any:
        self._ckptr.wait_until_finished()
        return self._ckptr.restore(self._step_dir(step), template)

    def restore_history(self, step) -> Optional[dict]:
        return safe_json_load(self._step_dir(step) / "history.json")

    def latest_step(self) -> Optional[int]:
        steps = sorted(
            int(p.name.split("_")[1]) for p in self.directory.glob("step_*"))
        return steps[-1] if steps else None

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def remove(self, step) -> None:
        """Delete a checkpoint (e.g. the rolling 'mid' preemption snapshot
        once its training run completed)."""
        import shutil

        self._ckptr.wait_until_finished()
        shutil.rmtree(self._step_dir(step), ignore_errors=True)

    def _gc(self) -> None:
        steps = sorted(self.directory.glob("step_*"))
        for p in steps[: max(0, len(steps) - self.max_to_keep)]:
            import shutil

            shutil.rmtree(p, ignore_errors=True)


# ---------------------------------------------------------------------------
# PyTorch checkpoint import
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file tolerant of the reference's three formats
    (``avenue_training_script_bbox.py:131-141``): a raw state dict,
    ``{'model_state_dict': ...}``, or ``{'state_dict': ...}``.
    Values come back as numpy arrays; torch is only needed here.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model_state_dict", "state_dict"):
            if key in obj:
                obj = obj[key]
                break
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def _conv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (O, I, kT, kH, kW) -> flax (kT, kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) -> flax (I, O)."""
    return np.transpose(w, (1, 0))


# torch key prefix -> (flax module path, kind)
_FAMILY_D_MAP = {
    "feature_extractor.conv3d_1": ("feature_extractor/conv3d_1/conv", "conv3d"),
    "feature_extractor.conv3d_2": ("feature_extractor/conv3d_2/conv", "conv3d"),
    "feature_extractor.conv3d_3": ("feature_extractor/conv3d_3/conv", "conv3d"),
    "feature_extractor.fc": ("feature_extractor/fc", "dense"),
    "causal_discovery.causal_net.0": ("causal_discovery/net_0", "dense"),
    "causal_discovery.causal_net.2": ("causal_discovery/net_2", "dense"),
    "graph_encoder.0": ("graph_encoder_0", "dense"),
    "graph_encoder.3": ("graph_encoder_3", "dense"),
    "anomaly_predictor.0": ("anomaly_predictor_0", "dense"),
    "anomaly_predictor.2": ("anomaly_predictor_2", "dense"),
}


def import_torch_family_d(path: str) -> Dict[str, Any]:
    """``best_improved_model.pth`` -> flax params for
    :class:`cvad_tpu.models.CausalAnomalyDetector`.

    The model definition places pooled features channel-major before the fc
    flatten, so torch weights apply without reindexing.
    """
    sd = load_torch_state_dict(path)
    params: Dict[str, Any] = {}
    for prefix, (flax_path, kind) in _FAMILY_D_MAP.items():
        w = sd[f"{prefix}.weight"]
        b = sd[f"{prefix}.bias"]
        node = params
        for part in flax_path.split("/"):
            node = node.setdefault(part, {})
        node["kernel"] = _conv3d_kernel(w) if kind == "conv3d" else _dense_kernel(w)
        node["bias"] = b
    return jax.tree_util.tree_map(np.asarray, {"params": params})


def export_family_d_torch_state(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse conversion: framework params -> torch-format state dict (so
    users of the reference can round-trip checkpoints)."""
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    for prefix, (flax_path, kind) in _FAMILY_D_MAP.items():
        node = params
        for part in flax_path.split("/"):
            node = node[part]
        k = np.asarray(node["kernel"])
        out[f"{prefix}.weight"] = (np.transpose(k, (4, 3, 0, 1, 2))
                                   if kind == "conv3d" else np.transpose(k, (1, 0)))
        out[f"{prefix}.bias"] = np.asarray(node["bias"])
    return out


def _conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _convT2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kH, kW) -> flax transpose_kernel
    (kH, kW, O, I) — verified numerically exact in tests."""
    return np.transpose(w, (2, 3, 1, 0))


def import_torch_family_b(path: str):
    """Reference ``VideoAutoEncoder`` (``causal_anomaly_detection1.py:124-199``)
    state dict -> framework variables + MemoryBankState.

    Returns ({'params', 'batch_stats'}, MemoryBankState).  LSTM gates are
    split from torch's fused (4H, ...) [i, f, g, o] layout into flax's
    per-gate denses (the single flax bias on the h-side = bias_ih + bias_hh).
    """
    import jax.numpy as jnp

    from cvad_tpu.models.family_b import MemoryBankState

    sd = load_torch_state_dict(path)
    params: Dict[str, Any] = {"encoder": {}, "decoder": {}, "lstm": {}}
    stats: Dict[str, Any] = {"encoder": {}, "decoder": {}}

    enc_convs = {0: "conv_0", 3: "conv_1", 6: "conv_2", 9: "conv_3"}
    enc_bns = {1: "bn_0", 4: "bn_1", 7: "bn_2", 10: "bn_3"}
    for t_idx, name in enc_convs.items():
        params["encoder"][name] = {
            "kernel": _conv2d_kernel(sd[f"encoder.{t_idx}.weight"]),
            "bias": sd[f"encoder.{t_idx}.bias"]}
    for t_idx, name in enc_bns.items():
        params["encoder"][name] = {"scale": sd[f"encoder.{t_idx}.weight"],
                                   "bias": sd[f"encoder.{t_idx}.bias"]}
        stats["encoder"][name] = {"mean": sd[f"encoder.{t_idx}.running_mean"],
                                  "var": sd[f"encoder.{t_idx}.running_var"]}
    params["encoder"]["fc"] = {"kernel": _dense_kernel(sd["encoder.13.weight"]),
                               "bias": sd["encoder.13.bias"]}

    params["decoder"]["fc"] = {"kernel": _dense_kernel(sd["decoder.0.weight"]),
                               "bias": sd["decoder.0.bias"]}
    dec_cts = {3: "deconv_0", 6: "deconv_1", 9: "deconv_2", 12: "deconv_out"}
    dec_bns = {4: "bn_0", 7: "bn_1", 10: "bn_2"}
    for t_idx, name in dec_cts.items():
        params["decoder"][name] = {
            "kernel": _convT2d_kernel(sd[f"decoder.{t_idx}.weight"]),
            "bias": sd[f"decoder.{t_idx}.bias"]}
    for t_idx, name in dec_bns.items():
        params["decoder"][name] = {"scale": sd[f"decoder.{t_idx}.weight"],
                                   "bias": sd[f"decoder.{t_idx}.bias"]}
        stats["decoder"][name] = {"mean": sd[f"decoder.{t_idx}.running_mean"],
                                  "var": sd[f"decoder.{t_idx}.running_var"]}

    w_ih = sd["temporal_encoder.weight_ih_l0"]  # (4H, I)
    w_hh = sd["temporal_encoder.weight_hh_l0"]  # (4H, H)
    b = sd["temporal_encoder.bias_ih_l0"] + sd["temporal_encoder.bias_hh_l0"]
    h = w_hh.shape[1]
    gates = ("i", "f", "g", "o")
    for gi, gate in enumerate(gates):
        sl = slice(gi * h, (gi + 1) * h)
        params["lstm"][f"i{gate}"] = {"kernel": np.transpose(w_ih[sl], (1, 0))}
        params["lstm"][f"h{gate}"] = {"kernel": np.transpose(w_hh[sl], (1, 0)),
                                      "bias": b[sl]}

    variables = jax.tree_util.tree_map(
        np.asarray, {"params": params, "batch_stats": stats})
    mem = sd.get("normal_memory")
    ptr = int(sd.get("memory_ptr", np.zeros(1))[0])
    memory = MemoryBankState(
        memory=jnp.asarray(mem) if mem is not None else jnp.zeros((500, h)),
        ptr=jnp.asarray(ptr, jnp.int32),
        # the reference uses ptr as its fill count (SURVEY.md §2.3)
        fill=jnp.asarray(ptr, jnp.int32))
    return variables, memory


def import_torch_family_c(path: str):
    """Reference ``SimpleVideoAnomalyDetector``
    (``minicausal_vad_complete3.py:25-102``) state dict -> framework
    variables for :class:`cvad_tpu.models.Simple3DCNNDetector`."""
    sd = load_torch_state_dict(path)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, (conv_idx, bn_idx) in enumerate([(0, 1), (4, 5), (8, 9)]):
        params[f"conv_{i}"] = {"conv": {
            "kernel": _conv3d_kernel(sd[f"features.{conv_idx}.weight"]),
            "bias": sd[f"features.{conv_idx}.bias"]}}
        params[f"bn_{i}"] = {"scale": sd[f"features.{bn_idx}.weight"],
                             "bias": sd[f"features.{bn_idx}.bias"]}
        stats[f"bn_{i}"] = {"mean": sd[f"features.{bn_idx}.running_mean"],
                            "var": sd[f"features.{bn_idx}.running_var"]}
    for t_idx, name in ((1, "cls_1"), (4, "cls_4"), (6, "cls_6")):
        params[name] = {"kernel": _dense_kernel(sd[f"classifier.{t_idx}.weight"]),
                        "bias": sd[f"classifier.{t_idx}.bias"]}
    return jax.tree_util.tree_map(
        np.asarray, {"params": params, "batch_stats": stats})


def family_a_feature_permutation(pool_hw=(4, 6), channels=256) -> np.ndarray:
    """Row permutation mapping torch's channel-major backbone flatten
    (index c*H*W + h*W + w over the pooled (C, H, W) map,
    ``causal_anomaly_detection.py:142-143`` view) onto the framework's
    natural (h, w, c) flatten.  Applied once at import time to the two
    dense layers that consume the feature vector, so the per-step
    activation transpose disappears from the forward pass."""
    ph, pw = pool_hw
    h, w, c = np.meshgrid(np.arange(ph), np.arange(pw), np.arange(channels),
                          indexing="ij")
    return (c * (ph * pw) + h * pw + w).reshape(-1)


def import_torch_family_a(src, variant: str = "enhanced") -> Dict[str, Any]:
    """Reference ``CausalAnomalyDetector`` (``causal_anomaly_detection.py:508-538``,
    or with ``variant='anchor'`` the earlier
    ``video_anomaly_detection.py:405-417``) state dict -> framework variables
    for :class:`cvad_tpu.models.CausalPipelineDetector` (anchor weights load
    into the ``anchor_variant=True`` config).  The two trees share the
    backbone/tracker/GRU/extractor/structure/dynamics mapping; they differ in
    the detector head (anchor: ``bbox_head``/``conf_head`` linears on the
    channel-major feature flatten) and the scorer (anchor: one ``score_net``,
    no direct classifier).

    `src` is a .pth path or an already-loaded ``{key: ndarray}`` state dict.
    Returns ``{'params', 'batch_stats'}``.  GRU gates split from torch's fused
    (3H, ·) [r, z, n] rows into flax's per-gate denses: flax's single ir/iz
    bias = torch ``b_ih + b_hh`` for the r/z gates (torch adds both before the
    sigmoid), while the n gate keeps them separate (``in`` = b_ih[n], ``hn`` =
    b_hh[n], applied inside the reset-gated term), matching torch's GRU cell
    equations exactly.
    """
    sd = dict(src) if isinstance(src, Mapping) else load_torch_state_dict(src)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def dense(tkey: str) -> Dict[str, np.ndarray]:
        return {"kernel": _dense_kernel(sd[f"{tkey}.weight"]),
                "bias": sd[f"{tkey}.bias"]}

    def put(tree: Dict, path: str, leaf) -> None:
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    # backbone: conv1/bn1 + 4 stages of [Conv,BN,ReLU,Conv,BN,ReLU]
    bb = params.setdefault("backbone", {})
    bb["conv1"] = {"kernel": _conv2d_kernel(sd["backbone.conv1.weight"]),
                   "bias": sd["backbone.conv1.bias"]}
    bns = [("backbone.bn1", "bn1")]
    for layer in range(1, 5):
        for t_idx, suffix in ((0, "conv0"), (3, "conv1")):
            bb[f"layer{layer}_{suffix}"] = {
                "kernel": _conv2d_kernel(sd[f"backbone.layer{layer}.{t_idx}.weight"]),
                "bias": sd[f"backbone.layer{layer}.{t_idx}.bias"]}
        bns += [(f"backbone.layer{layer}.1", f"layer{layer}_bn0"),
                (f"backbone.layer{layer}.4", f"layer{layer}_bn1")]
    for tkey, fname in bns:
        bb[fname] = {"scale": sd[f"{tkey}.weight"], "bias": sd[f"{tkey}.bias"]}
        stats.setdefault("backbone", {})[fname] = {
            "mean": sd[f"{tkey}.running_mean"],
            "var": sd[f"{tkey}.running_var"]}

    # detector — any head consuming the backbone flatten permutes its input
    # rows from torch's channel-major order onto the framework's natural
    # (h, w, c) flatten (models/family_a.py ResNetBackbone note)
    feat_perm = family_a_feature_permutation()
    if variant == "anchor":
        for head in ("bbox_head", "conf_head"):
            leaf = dense(f"detector.{head}")
            put(params, f"detector/{head}",
                {**leaf, "kernel": leaf["kernel"][feat_perm]})
    else:
        # detector MLP (Sequential idx 0,3,6,8 -> dense_0..3; 10 -> out)
        for i, t_idx in enumerate((0, 3, 6, 8)):
            leaf = dense(f"detector.detector_net.{t_idx}")
            if i == 0:
                leaf = {**leaf, "kernel": leaf["kernel"][feat_perm]}
            put(params, f"detector/detector_net/dense_{i}", leaf)
        put(params, "detector/detector_out", dense("detector.detector_net.10"))

    for i in (0, 2, 4):
        put(params, f"tracker/reid_{i}", dense(f"tracker.reid_net.{i}"))

    # GRU: torch fused (3H, ·) rows [r, z, n] -> flax per-gate denses
    w_ih = sd["traj_encoder.gru.weight_ih_l0"]
    w_hh = sd["traj_encoder.gru.weight_hh_l0"]
    b_ih = sd["traj_encoder.gru.bias_ih_l0"]
    b_hh = sd["traj_encoder.gru.bias_hh_l0"]
    h = w_hh.shape[1]
    for gi, gate in enumerate(("r", "z", "n")):
        sl = slice(gi * h, (gi + 1) * h)
        iname = "in" if gate == "n" else f"i{gate}"
        ib = b_ih[sl] if gate == "n" else b_ih[sl] + b_hh[sl]
        put(params, f"traj_encoder/GRUCell_0/{iname}",
            {"kernel": np.transpose(w_ih[sl], (1, 0)), "bias": ib})
        hleaf = {"kernel": np.transpose(w_hh[sl], (1, 0))}
        if gate == "n":
            hleaf["bias"] = b_hh[sl]
        put(params, f"traj_encoder/GRUCell_0/h{gate}", hleaf)
    put(params, "traj_encoder/encoder", dense("traj_encoder.encoder"))

    for t_idx, name in ((0, "enc_0"), (2, "enc_2")):
        put(params, f"causal_extractor/{name}",
            dense(f"causal_extractor.encoder.{t_idx}"))
    put(params, "causal_extractor/mu_head", dense("causal_extractor.mu_head"))
    put(params, "causal_extractor/logvar_head",
        dense("causal_extractor.logvar_head"))

    put(params, "structure_learner/node_encoder",
        dense("structure_learner.node_encoder"))
    for t_idx, name in ((0, "edge_0"), (2, "edge_2")):
        put(params, f"structure_learner/{name}",
            dense(f"structure_learner.edge_predictor.{t_idx}"))
    put(params, "structure_learner/structure_params",
        sd["structure_learner.structure_params"])

    for t_idx, name in ((0, "dyn_0"), (2, "dyn_2"), (4, "dyn_4")):
        put(params, f"dynamics_predictor/{name}",
            dense(f"dynamics_predictor.dynamics_net.{t_idx}"))

    if variant == "anchor":
        for i, t_idx in enumerate((0, 2, 4)):
            put(params, f"anomaly_scorer/score_net/dense_{i}",
                dense(f"anomaly_scorer.score_net.{t_idx}"))
        return jax.tree_util.tree_map(
            np.asarray, {"params": params, "batch_stats": stats})

    for head, idxs in (("causal_scorer", (0, 3, 5)),
                       ("motion_scorer", (0, 2, 4)),
                       ("temporal_scorer", (0, 2, 4))):
        for i, t_idx in enumerate(idxs):
            put(params, f"anomaly_scorer/{head}/dense_{i}",
                dense(f"anomaly_scorer.{head}.{t_idx}"))

    for i, t_idx in enumerate((0, 3, 6, 8, 10)):
        leaf = dense(f"direct_classifier.{t_idx}")
        if i == 0:  # consumes the (time-pooled) backbone flatten
            leaf = {**leaf, "kernel": leaf["kernel"][feat_perm]}
        put(params, f"direct_classifier/dense_{i}", leaf)

    return jax.tree_util.tree_map(
        np.asarray, {"params": params, "batch_stats": stats})


# torch key prefix -> (flax module path, kind) for the bbox stand-in model
# (``avenue_training_script_bbox.py:51-101``).  Feature flatten is
# channel-major on both sides (torch ``view(B,-1)`` on (B,64,1,4,4) vs our
# transpose-then-reshape), so dense weights apply without reindexing.
_FAMILY_E_MAP = {
    "encoder.0": ("enc_conv0/conv", "conv3d"),
    "encoder.3": ("enc_conv3/conv", "conv3d"),
    "causal_net.0": ("causal_0", "dense"),
    "causal_net.2": ("causal_2", "dense"),
    "classifier.0": ("cls_0", "dense"),
    "classifier.3": ("cls_3", "dense"),
}


def import_torch_family_e(src) -> Dict[str, Any]:
    """Reference bbox-viz ``CausalAnomalyDetector``
    (``avenue_training_script_bbox.py:51-101``) state dict -> framework
    variables for :class:`cvad_tpu.models.BBoxVizDetector`.

    The reference ships no checkpoint for this architecture (its loader
    falls back to random weights when the shipped family-D checkpoint's
    module names don't match, ``:150-155``); this importer covers
    user-trained state dicts.  `src` is a .pth path or an already-loaded
    ``{key: ndarray}`` state dict.
    """
    sd = dict(src) if isinstance(src, Mapping) else load_torch_state_dict(src)
    params: Dict[str, Any] = {}
    for prefix, (flax_path, kind) in _FAMILY_E_MAP.items():
        w = sd[f"{prefix}.weight"]
        b = sd[f"{prefix}.bias"]
        node = params
        for part in flax_path.split("/"):
            node = node.setdefault(part, {})
        node["kernel"] = _conv3d_kernel(w) if kind == "conv3d" else _dense_kernel(w)
        node["bias"] = b
    return jax.tree_util.tree_map(np.asarray, {"params": params})


def export_family_e_torch_state(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse conversion: framework family-E params -> torch-format state
    dict (round-trip with the reference's loader formats)."""
    params = variables["params"]
    out: Dict[str, np.ndarray] = {}
    for prefix, (flax_path, kind) in _FAMILY_E_MAP.items():
        node = params
        for part in flax_path.split("/"):
            node = node[part]
        k = np.asarray(node["kernel"])
        out[f"{prefix}.weight"] = (np.transpose(k, (4, 3, 0, 1, 2))
                                   if kind == "conv3d" else np.transpose(k, (1, 0)))
        out[f"{prefix}.bias"] = np.asarray(node["bias"])
    return out


def import_torch_generic(path: str, params_template: Mapping[str, Any],
                         rename: Optional[Mapping[str, str]] = None
                         ) -> Dict[str, Any]:
    """Best-effort import for other families: match torch keys to template
    leaves by normalized name + shape.  Used by tests and the converter CLI."""
    sd = load_torch_state_dict(path)
    # deep-copy the structure: matched leaves are assigned into nested
    # dicts, and a shallow dict() would write through into the CALLER's
    # (possibly live-model) tree
    out = jax.tree_util.tree_map(lambda x: x, dict(params_template))
    flat = jax.tree_util.tree_flatten_with_path(out)[0]

    def norm(s: str) -> str:
        return re.sub(r"[^a-z0-9]", "", s.lower())

    for torch_key, value in sd.items():
        target = (rename or {}).get(torch_key, torch_key)
        v = value
        if v.ndim == 5:
            v = _conv3d_kernel(v)
        elif v.ndim == 4:
            v = np.transpose(v, (2, 3, 1, 0))
        elif v.ndim == 2:
            v = _dense_kernel(v)
        for keypath, leaf in flat:
            path_str = norm("".join(str(k) for k in keypath))
            if norm(target) in path_str and leaf.shape == v.shape:
                node = out
                for k in keypath[:-1]:
                    node = node[k.key]  # type: ignore[union-attr]
                node[keypath[-1].key] = v  # type: ignore[union-attr]
                break
    return out
