"""Family-D training-dynamics parity: reference torch trainer vs our engine.

The reference's only real-data training artifact is
``improved_training_history.json`` (80 epochs of `avenue_training_script2.py`
on CUHK Avenue: acyclicity 1.917 -> 5.59e-5, score_range 2.01e-2 -> 4.91e-5,
plateau-lr staircase 5e-4 -> 1.22e-7).  AUC parity is meaningless for this
family — its loss trains against 5% *random* pseudo-labels
(`avenue_training_script2.py:139-141`) — so "trains like the reference" means
the **component trajectories** move the same way on the same data:

- acyclicity loss decays by orders of magnitude (the NOTEARS trace term),
- sparsity_ratio / edge_count settle into the 10..40-edge band the
  structure term encourages,
- the ReduceLROnPlateau staircase fires at comparable epochs,
- eval score_range collapses as scores concentrate.

Both sides consume byte-identical uint8-quantized synthetic clips (same
recipe as scripts/auc_parity.py); each keeps its own init and its own
per-batch pseudo-label draws — the study compares dynamics distributions,
not bit equality (the reference itself is not seed-reproducible: its
pseudo-labels come from an unseeded ``torch.rand_like`` per batch).

Reference trainer: `avenue_training_script2.py:107-297` (AdamW 5e-4/1e-3,
5-term `compute_improved_loss`, clip 0.5, plateau factor 0.5 patience 5,
driver loop :398-460 evaluating every 5 epochs).  Ours:
`cvad_tpu.compat.train_improved_minicausal_vad` (same driver contract).

Usage: python scripts/dyn_parity_d.py [--epochs 30] [--n-train 128]
Writes runs/dyn_parity_d/{ref_history,ours_history,comparison}.json.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from auc_parity import load_reference_module, _torch_view  # noqa: E402


class _EpochShuffledLoader:
    """Framework-side loader: dict batches, reshuffled every epoch (the
    torch DataLoader semantics the reference driver sees).

    Matched-noise mode: `perms` replays the torch DataLoader's exact
    per-epoch permutations (same clips in the same batches) and
    `pseudo_stream` attaches the shared per-batch pseudo-label draws as
    ``batch["pseudo_targets"]`` (the family-D task consumes them instead of
    its own RNG)."""

    def __init__(self, clips: np.ndarray, labels: np.ndarray,
                 batch_size: int, seed: int, shuffle: bool = True,
                 perms=None, pseudo_stream=None):
        self.clips, self.labels = clips, labels
        self.batch_size, self.shuffle = batch_size, shuffle
        self._rng = np.random.default_rng(seed)
        self._perms = perms
        self._stream = iter(pseudo_stream) if pseudo_stream is not None \
            else None
        self._epoch = 0

    def __len__(self):
        return len(self.clips) // self.batch_size

    def __iter__(self):
        if self._perms is not None:
            idx = np.asarray(self._perms[self._epoch])
            self._epoch += 1
        else:
            idx = np.arange(len(self.clips))
            if self.shuffle:
                self._rng.shuffle(idx)
        for i in range(len(self)):
            sel = idx[i * self.batch_size:(i + 1) * self.batch_size]
            batch = {"clips": self.clips[sel], "labels": self.labels[sel]}
            if self._stream is not None:
                batch["pseudo_targets"] = np.asarray(next(self._stream),
                                                     np.float32)
            yield batch


def _make_data(n_train: int, n_test: int, batch_size: int, cfg,
               epochs: int = 0, matched_noise: bool = False):
    """Byte-identical uint8-quantized clips for both sides.

    With `matched_noise`: both sides also share (a) the per-epoch shuffle
    permutations (ours replays the torch DataLoader's exact randperm
    sequence) and (b) one precomputed pseudo-label stream, so the anomaly
    term's trajectory is comparable batch-for-batch — only the inits (and
    dropout draws) differ.  Returns (ours_loaders, ref_loaders,
    pseudo_stream_for_ref)."""
    from cvad_tpu.data.datasets import SyntheticClipDataset

    tr = SyntheticClipDataset(cfg.data, n=n_train, split="Train")
    te = SyntheticClipDataset(cfg.data, n=n_test, split="Test")
    # channels-last float view (framework) — same values the torch view gets
    xtr, ytr = _torch_view(tr, cfg.data.normalize_clamp, "THWC_KEEP")
    xte, yte = _torch_view(te, cfg.data.normalize_clamp, "THWC_KEEP")
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    perms = stream = None
    if matched_noise:
        assert n_train % batch_size == 0, (
            "matched-noise mode needs n_train divisible by batch_size so "
            "both sides consume the same number of stream draws per epoch")
        # Replay the torch DataLoader's EXACT per-epoch order by iterating
        # an identical twin over index tensors (same generator seed, same
        # construction).  A bare randperm replay is NOT equivalent: each
        # DataLoader iterator creation consumes an extra _base_seed draw
        # from the generator before the sampler's randperm (verified on
        # torch 2.13 — orders diverge from epoch 0), so only torch itself
        # can produce the sequence faithfully.
        probe = DataLoader(
            TensorDataset(torch.arange(n_train)), batch_size=batch_size,
            shuffle=True,
            generator=torch.Generator().manual_seed(cfg.data.seed))
        perms = [torch.cat([b[0] for b in probe]).numpy()
                 for _ in range(epochs)]
        # canary: twin construction must be deterministic, or the ref
        # loader (built identically below) would see different orders
        probe2 = DataLoader(
            TensorDataset(torch.arange(n_train)), batch_size=batch_size,
            shuffle=True,
            generator=torch.Generator().manual_seed(cfg.data.seed))
        for a in perms[:2]:
            b = torch.cat([x[0] for x in probe2]).numpy()
            assert (a == b).all(), "DataLoader twin not deterministic"
        srng = np.random.default_rng(cfg.data.seed + 7919)
        n_batches = n_train // batch_size
        stream = [(srng.uniform(size=batch_size) > 0.95).astype(np.float32)
                  for _ in range(epochs * n_batches)]
    ours = (_EpochShuffledLoader(xtr, ytr, batch_size, seed=cfg.data.seed,
                                 perms=perms, pseudo_stream=stream),
            _EpochShuffledLoader(xte, yte, batch_size, shuffle=False,
                                 seed=cfg.data.seed))
    # torch view: (B, C, T, H, W)
    t_xtr = np.ascontiguousarray(xtr.transpose(0, 4, 1, 2, 3))
    t_xte = np.ascontiguousarray(xte.transpose(0, 4, 1, 2, 3))
    gen = torch.Generator().manual_seed(cfg.data.seed)
    ref = (DataLoader(TensorDataset(torch.from_numpy(t_xtr),
                                    torch.from_numpy(ytr)),
                      batch_size=batch_size, shuffle=True, generator=gen),
           DataLoader(TensorDataset(torch.from_numpy(t_xte),
                                    torch.from_numpy(yte)),
                      batch_size=batch_size, shuffle=False))
    return ours, ref, stream


def run_reference(epochs: int, loaders, seed: int, out_dir: Path,
                  pseudo_stream=None) -> dict:
    """The reference driver loop (`avenue_training_script2.py:398-460`),
    CPU device, history in the v2 schema.

    With `pseudo_stream`, ``torch.rand_like`` — whose ONLY call site in the
    reference trainer is the pseudo-label draw
    (``avenue_training_script2.py:141``, grep-verified) — is patched to
    replay the shared stream: it returns uniforms placed so that
    ``(u > 0.95)`` reproduces the injected labels exactly."""
    import torch

    ref = load_reference_module("avenue_training_script2")
    torch.manual_seed(seed)
    model = ref.ImprovedMiniCausalVAD(device="cpu")
    train_loader, test_loader = loaders
    orig_rand_like = torch.rand_like
    if pseudo_stream is not None:
        it = iter(pseudo_stream)

        def _replay_rand_like(t, **kw):
            lbl = np.asarray(next(it), np.float32)
            u = np.where(lbl > 0.5, 0.99, 0.5).astype(np.float32)
            return torch.from_numpy(u).to(t.dtype).reshape(t.shape)

        torch.rand_like = _replay_rand_like
    history = {"train_losses": [], "loss_components": [],
               "evaluation_metrics": [], "epochs": [], "learning_rates": []}
    t0 = time.perf_counter()
    try:
        for epoch in range(epochs):
            train_loss, comps = model.train_epoch_improved(train_loader)
            history["train_losses"].append(float(train_loss))
            history["loss_components"].append(
                {k: float(v) for k, v in comps.items()})
            history["epochs"].append(epoch + 1)
            history["learning_rates"].append(
                float(model.optimizer.param_groups[0]["lr"]))
            if epoch % 5 == 0 or epoch == epochs - 1:
                _, _, eval_metrics = model.evaluate_improved(test_loader)
                history["evaluation_metrics"].append(
                    {k: float(v) for k, v in eval_metrics.items()})
    finally:
        torch.rand_like = orig_rand_like
    history["wall_s"] = round(time.perf_counter() - t0, 1)
    (out_dir / "ref_history.json").write_text(json.dumps(history, indent=1))
    return history


def run_ours(epochs: int, loaders, out_dir: Path) -> dict:
    from cvad_tpu.compat import train_improved_minicausal_vad

    t0 = time.perf_counter()
    _, history = train_improved_minicausal_vad(
        dataset_path="", num_epochs=epochs, loaders=loaders,
        output_dir=str(out_dir / "ours"))
    history = {k: v for k, v in history.items()}
    history["wall_s"] = round(time.perf_counter() - t0, 1)
    (out_dir / "ours_history.json").write_text(json.dumps(history, indent=1))
    return history


def _staircase_epochs(lrs: list[float]) -> list[int]:
    """1-based epochs after which the plateau scheduler cut the lr."""
    return [i + 1 for i in range(1, len(lrs)) if lrs[i] < lrs[i - 1] * 0.99]


def _traj(history: dict, key: str) -> np.ndarray:
    return np.array([c[key] for c in history["loss_components"]], np.float64)


def compare(ref: dict, ours: dict, shipped: dict | None) -> dict:
    """Trajectory comparison: decay ratios, correlations, staircase timing."""
    out = {}
    for key in ("acyclicity_loss", "sparsity_ratio", "edge_count",
                "anomaly_loss"):
        r, o = _traj(ref, key), _traj(ours, key)
        row = {"ref_first": round(float(r[0]), 6),
               "ref_last": round(float(r[-1]), 6),
               "ours_first": round(float(o[0]), 6),
               "ours_last": round(float(o[-1]), 6)}
        if key == "acyclicity_loss":
            # decay spans orders of magnitude -> compare in log space
            eps = 1e-12
            row["ref_log10_decay"] = round(
                float(np.log10(r[0] + eps) - np.log10(r[-1] + eps)), 3)
            row["ours_log10_decay"] = round(
                float(np.log10(o[0] + eps) - np.log10(o[-1] + eps)), 3)
            lr_, lo = np.log10(r + eps), np.log10(o + eps)
            if len(r) > 2 and lr_.std() > 0 and lo.std() > 0:
                row["log_traj_pearson"] = round(
                    float(np.corrcoef(lr_, lo)[0, 1]), 3)
        else:
            if len(r) > 2 and r.std() > 0 and o.std() > 0:
                row["traj_pearson"] = round(float(np.corrcoef(r, o)[0, 1]), 3)
        out[key] = row
    out["lr_staircase"] = {
        "ref_step_epochs": _staircase_epochs(ref["learning_rates"]),
        "ours_step_epochs": _staircase_epochs(ours["learning_rates"]),
        "ref_final_lr": ref["learning_rates"][-1],
        "ours_final_lr": ours["learning_rates"][-1]}
    for side, h in (("ref", ref), ("ours", ours)):
        ev = h["evaluation_metrics"]
        out.setdefault("score_range", {})[side] = {
            "first": round(ev[0]["score_range"], 6),
            "last": round(ev[-1]["score_range"], 6)}
    if shipped is not None:
        comps = shipped["loss_components"]
        out["shipped_80epoch_context"] = {
            "acyclicity_first": comps[0]["acyclicity_loss"],
            "acyclicity_last": comps[-1]["acyclicity_loss"],
            "lr_first": shipped["learning_rates"][0],
            "lr_last": shipped["learning_rates"][-1],
            "score_range_first":
                shipped["evaluation_metrics"][0]["score_range"],
            "score_range_last":
                shipped["evaluation_metrics"][-1]["score_range"],
            "note": "real CUHK Avenue, 80 epochs — shape context only "
                    "(different data, horizon)"}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--out", default=str(REPO / "runs" / "dyn_parity_d"))
    ap.add_argument("--no-matched-noise", action="store_true",
                    help="let each side draw its own pseudo-labels/shuffles "
                         "(the pre-round-5 comparison mode)")
    args = ap.parse_args()
    matched = not args.no_matched_noise
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    from cvad_tpu.config import preset

    cfg = preset("avenue_improved")
    cfg = cfg.replace(data=cfg.data.replace(dataset="synthetic"))
    n_test = max(args.n_train // 2, 4)
    ours_loaders, ref_loaders, stream = _make_data(
        args.n_train, n_test, args.batch_size, cfg, epochs=args.epochs,
        matched_noise=matched)

    print(f"[dyn_parity_d] ours: {args.epochs} epochs x "
          f"{len(ours_loaders[0])} batches (matched_noise={matched})",
          flush=True)
    ours = run_ours(args.epochs, ours_loaders, out_dir)
    print(f"[dyn_parity_d] ours done in {ours['wall_s']}s; reference...",
          flush=True)
    ref = run_reference(args.epochs, ref_loaders, cfg.train.seed, out_dir,
                        pseudo_stream=stream)
    print(f"[dyn_parity_d] reference done in {ref['wall_s']}s", flush=True)

    shipped_path = Path("/root/reference/improved_training_history.json")
    shipped = (json.loads(shipped_path.read_text())
               if shipped_path.exists() else None)
    cmp = compare(ref, ours, shipped)
    note = ("identical uint8 synthetic clips both sides; matched per-epoch "
            "shuffle permutations AND one shared pseudo-label stream "
            "(torch.rand_like replayed on the reference side; "
            "batch['pseudo_targets'] injected on ours) — only inits and "
            "dropout draws differ" if matched else
            "identical uint8 synthetic clips both sides; each side its own "
            "init + pseudo-label draws (reference's are unseeded by design)")
    cmp["config"] = {"epochs": args.epochs, "n_train": args.n_train,
                     "n_test": n_test, "batch_size": args.batch_size,
                     "matched_noise": matched,
                     "measured_at": time.time(),
                     "ref_wall_s": ref["wall_s"], "ours_wall_s": ours["wall_s"],
                     "note": note}
    (out_dir / "comparison.json").write_text(json.dumps(cmp, indent=1) + "\n")

    acy = cmp["acyclicity_loss"]
    print(f"\nacyclicity: ref {acy['ref_first']:.4g} -> {acy['ref_last']:.4g} "
          f"(10^{acy['ref_log10_decay']}), ours {acy['ours_first']:.4g} -> "
          f"{acy['ours_last']:.4g} (10^{acy['ours_log10_decay']})")
    sp = cmp["sparsity_ratio"]
    print(f"sparsity_ratio final: ref {sp['ref_last']:.3f} ours "
          f"{sp['ours_last']:.3f}")
    st = cmp["lr_staircase"]
    print(f"lr staircase: ref steps {st['ref_step_epochs']} ours "
          f"{st['ours_step_epochs']}")
    print(f"results -> {out_dir / 'comparison.json'}")


if __name__ == "__main__":
    main()
