"""AUC parity study: reference torch vs cvad_tpu on identical synthetic data.

North-star context (SURVEY.md §6, BASELINE.md): the reference publishes no
frame-AUC and the real CUHK Avenue / UCSD Ped2 trees are not present in this
environment, so detection-quality parity is established the only honest way
available — train BOTH implementations on byte-identical synthetic clips
(the generator with learnable normal/anomalous separation,
`cvad_tpu/data/synthetic.py`) under the same hyperparameters, and compare
test-set ROC-AUC.

Families covered:

- **C** — supervised 3D-CNN classifier: reference
  `minicausal_vad_complete3.py:218-392` (`StableTrainer`, Adam + StepLR +
  BCE, AUC from `evaluate()`), ours `preset("family_c")`.
- **B** — normal-only memory autoencoder: reference
  `causal_anomaly_detection1.py:346-524` (`train_model`) scored by
  `:526-566` (`calculate_anomaly_scores`, 0.7*recon + 0.3*memory blend),
  ours `preset("family_b")`.
- **A** — 12-stage causal pipeline (enhanced variant): reference
  `causal_anomaly_detection.py:519-586` trained by `:609-790`
  (`train_model`: frozen stem, AdamW + cosine, 0.4*CE + 0.3*MSE +
  0.2*causal-MSE + 0.1*KL), scored by the blended `anomaly_scores`; ours
  `preset("family_a")`.  This is the hardest redesign in the framework
  (ragged torch lists -> fixed-K masked lanes) — this row is the evidence
  the masked pipeline *trains* to the same detection quality, not just
  that its forward matches (round-2 verdict missing #2).

Task difficulty (``--profile``): ``hard`` (default) uses the
motion-coherence-only generator (`synthetic.py` profile='hard') calibrated
so the reference lands mid-AUC instead of saturating at 1.0; ``easy`` keeps
the original separable fixture recipe for comparison with round-2 numbers.

Family D is excluded by design: its reference loss discards the provided
targets and trains against 5% *random* pseudo-labels
(`avenue_training_script2.py:139-141`), so supervised AUC is chance for any
faithful implementation; family-D parity is covered by forward-numerics
tests (tests/test_torch_parity.py) and the compat drivers' 80-epoch
trajectory soak (runs/soak_80epoch) instead.

Data equality: both sides consume the same uint8-quantized clips the
framework trains on (`SyntheticClipDataset.get_uint8` / `prep_clips`
semantics: round(x*255)/255, then the family clamp).  Model inits remain
each implementation's own (torch kaiming vs our ported init) — the study
compares what a user gets, not bit equality.

Usage: python scripts/auc_parity.py [--fast] [--profile easy|hard]
                                    [--families c,b,a]
Writes runs/auc_parity/results.json and prints one summary table.
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE_DIR = os.environ.get("CVAD_REFERENCE", "/root/reference")


def load_reference_module(name: str):
    """Import a reference script as a parity oracle (mirrors
    tests/conftest.py::load_reference_module; reference code is never copied
    into the framework).  torchvision is absent here — stub it."""
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    # torch>=2.13 removed ReduceLROnPlateau's `verbose` kwarg (the reference
    # passes it, causal_anomaly_detection1.py:354) — shim like bench.py does
    import torch.optim.lr_scheduler as lrs

    if "verbose" not in lrs.ReduceLROnPlateau.__init__.__code__.co_varnames:
        _orig = lrs.ReduceLROnPlateau.__init__

        def _patched(self, *a, verbose=False, **k):
            _orig(self, *a, **k)

        lrs.ReduceLROnPlateau.__init__ = _patched

    path = os.path.join(REFERENCE_DIR, f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_view(ds, clamp, layout: str, label_dtype=np.float32):
    """The framework's exact input values for the torch side: uint8
    quantization then the family clamp (train/tasks.py::prep_clips)."""
    x = np.round(ds.data * 255.0).astype(np.uint8).astype(np.float32) / 255.0
    lo, hi = clamp
    if (lo, hi) != (0.0, 1.0):
        x = np.clip(x, lo, hi)
    if layout == "BCTHW":      # family C forward (minicausal :25-107)
        x = x.transpose(0, 4, 1, 2, 3)
    elif layout == "BTCHW":    # families A/B forward (B, T, C, H, W)
        x = x.transpose(0, 1, 4, 2, 3)
    return np.ascontiguousarray(x), ds.labels.astype(label_dtype)


def _torch_loaders(cfg, n_train, n_test, layout, label_dtype=np.float32):
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    from cvad_tpu.data.datasets import SyntheticClipDataset

    tr = SyntheticClipDataset(cfg.data, n=n_train, split="Train")
    te = SyntheticClipDataset(cfg.data, n=n_test, split="Test")
    xtr, ytr = _torch_view(tr, cfg.data.normalize_clamp, layout, label_dtype)
    xte, yte = _torch_view(te, cfg.data.normalize_clamp, layout, label_dtype)
    gen = torch.Generator().manual_seed(cfg.data.seed)
    tl = DataLoader(TensorDataset(torch.from_numpy(xtr), torch.from_numpy(ytr)),
                    batch_size=cfg.data.batch_size, shuffle=True, generator=gen)
    el = DataLoader(TensorDataset(torch.from_numpy(xte), torch.from_numpy(yte)),
                    batch_size=cfg.data.batch_size, shuffle=False)
    return tl, el


def _ours_auc(cfg, n_train):
    """Train the framework side; returns (final AUC, best-epoch AUC, wall).

    Both sides' AUC trajectories on the hard task are volatile in the
    takeoff regime (single-epoch swings of ±0.1), so the study records the
    best epoch alongside the final one — the reference's own StableTrainer
    tracks best_auc the same way (minicausal_vad_complete3.py:246)."""
    from cvad_tpu.runtime.mesh import create_mesh
    from cvad_tpu.train.engine import Trainer, make_loaders

    t0 = time.perf_counter()
    trainer = Trainer(cfg, mesh=create_mesh())
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=n_train)
    hist = trainer.fit(train_loader, eval_loader)
    aucs = [float(m["auc"]) for m in hist["evaluation_metrics"] if "auc" in m]
    return aucs[-1], max(aucs), time.perf_counter() - t0


def run_family_a(epochs: int, n_train: int, out_dir: Path,
                 profile: str = "hard", seed: int | None = None) -> dict:
    """12-stage causal pipeline (enhanced): both sides frozen-stem AdamW +
    cosine, the reference 4-term loss, AUC on the blended anomaly scores.

    ``seed`` varies ONLY the init/dropout draw (see run_family_c)."""
    from cvad_tpu.config import preset

    cfg = preset("family_a")
    cfg = cfg.replace(
        data=cfg.data.replace(dataset="synthetic", batch_size=8,
                              frame_size=(64, 64), synthetic_profile=profile,
                              label_policy="none"),
        train=cfg.train.replace(num_epochs=epochs,
                                out_dir=str(out_dir / "ours_a"),
                                log_every=10**9))
    if seed is not None:
        cfg = cfg.replace(train=cfg.train.replace(seed=seed))
    n_test = max(n_train // 2, 2)
    ours_auc, ours_best, ours_s = _ours_auc(cfg, n_train)

    import torch
    from sklearn.metrics import roc_auc_score
    ref = load_reference_module("causal_anomaly_detection")
    torch.manual_seed(cfg.train.seed)
    model = ref.CausalAnomalyDetector(num_factors=cfg.model.num_factors,
                                      reid_dim=cfg.model.reid_dim)
    # CE labels must be int64 (train_model :649); the videos are the same
    # uint8-quantized [0,1] grays both sides (ours skips the reference
    # main()'s Normalize(0.5, 0.5) — a preprocessing affine, applied to
    # neither side here)
    tl, el = _torch_loaders(cfg, n_train, n_test, "BTCHW",
                            label_dtype=np.int64)
    t0 = time.perf_counter()
    model, _, _ = ref.train_model(model, tl, el, num_epochs=epochs,
                                  lr=cfg.optim.lr)
    model.eval()
    scores, labels = [], []
    with torch.no_grad():
        for videos, y in el:
            out = model(videos)
            scores.append(out["anomaly_scores"].numpy())
            labels.append(y.numpy())
    ref_auc = float(roc_auc_score(np.concatenate(labels),
                                  np.concatenate(scores)))
    ref_s = time.perf_counter() - t0
    return {"family": "a", "profile": profile, "epochs": epochs,
            "lr": cfg.optim.lr, "seed": cfg.train.seed,
            "n_train": n_train, "n_test": n_test,
            "reference_auc": ref_auc, "ours_auc": ours_auc,
            "ours_best_auc": round(ours_best, 4),
            "reference_wall_s": round(ref_s, 1), "ours_wall_s": round(ours_s, 1)}


def run_family_c(epochs: int, n_train: int, out_dir: Path,
                 profile: str = "hard", seed: int | None = None) -> dict:
    """Supervised 3D CNN: both sides Adam(lr), StepLR, BCE on true labels.

    ``seed`` varies ONLY the init/dropout draw (our ``train.seed``, torch's
    ``manual_seed``); the dataset (``data.seed``) and the torch loader's
    shuffle generator stay fixed so every seed trains on the identical task.
    """
    from cvad_tpu.config import preset

    cfg = preset("family_c")
    cfg = cfg.replace(
        data=cfg.data.replace(dataset="synthetic", batch_size=16,
                              synthetic_profile=profile),
        train=cfg.train.replace(num_epochs=epochs, out_dir=str(out_dir / "ours_c"),
                                log_every=10**9))
    if seed is not None:
        cfg = cfg.replace(train=cfg.train.replace(seed=seed))
    n_test = max(n_train // 2, 2)
    ours_auc, ours_best, ours_s = _ours_auc(cfg, n_train)

    import torch
    ref = load_reference_module("minicausal_vad_complete3")
    torch.manual_seed(cfg.train.seed)
    model = ref.SimpleVideoAnomalyDetector(
        input_channels=cfg.data.channels, temporal_frames=cfg.data.clip_len,
        spatial_size=cfg.data.frame_size[0])
    tl, el = _torch_loaders(cfg, n_train, n_test, "BCTHW")
    trainer = ref.StableTrainer(model, tl, el, torch.device("cpu"),
                                lr=cfg.optim.lr)
    t0 = time.perf_counter()
    trainer.train_model(epochs, save_path=str(out_dir / "ref_c.pth"))
    ref_auc = float(trainer.history["test_auc"][-1])
    ref_s = time.perf_counter() - t0
    return {"family": "c", "profile": profile, "epochs": epochs,
            "lr": cfg.optim.lr, "seed": cfg.train.seed,
            "n_train": n_train, "n_test": n_test,
            "reference_auc": ref_auc, "ours_auc": ours_auc,
            "reference_best_auc": round(max(trainer.history["test_auc"]), 4),
            "ours_best_auc": round(ours_best, 4),
            "reference_wall_s": round(ref_s, 1), "ours_wall_s": round(ours_s, 1)}


def run_family_b(epochs: int, n_train: int, out_dir: Path,
                 lr: float = 1e-4, profile: str = "hard",
                 seed: int | None = None) -> dict:
    """Normal-only AE + memory bank; scored by the 0.7/0.3 blend.

    The reference main() trains at lr=1e-6 for 25+ epochs on real Ped2; the
    synthetic study raises lr equally on both sides so separation emerges
    within a few epochs."""
    from cvad_tpu.config import preset

    cfg = preset("family_b")
    cfg = cfg.replace(
        data=cfg.data.replace(dataset="synthetic", batch_size=8,
                              synthetic_profile=profile),
        optim=cfg.optim.replace(lr=lr),
        train=cfg.train.replace(num_epochs=epochs, out_dir=str(out_dir / "ours_b"),
                                log_every=10**9, early_stop_patience=0))
    if seed is not None:
        cfg = cfg.replace(train=cfg.train.replace(seed=seed))
    n_test = max(n_train // 2, 2)
    ours_auc, ours_best, ours_s = _ours_auc(cfg, n_train)

    import torch
    from sklearn.metrics import roc_auc_score
    ref = load_reference_module("causal_anomaly_detection1")
    torch.manual_seed(cfg.train.seed)
    model = ref.VideoAutoEncoder(input_channels=cfg.data.channels,
                                 latent_dim=cfg.model.latent_dim)
    tl, el = _torch_loaders(cfg, n_train, n_test, "BTCHW")
    t0 = time.perf_counter()
    cwd = os.getcwd()
    os.chdir(out_dir)  # the reference writes best_robust_autoencoder.pth to CWD
    try:
        model, _, _ = ref.train_model(model, tl, el, num_epochs=epochs, lr=lr)
        scores, labels, _, _ = ref.calculate_anomaly_scores(model, el)
    finally:
        os.chdir(cwd)
    ref_auc = float(roc_auc_score(labels, scores))
    ref_s = time.perf_counter() - t0
    return {"family": "b", "profile": profile, "epochs": epochs, "lr": lr,
            "seed": cfg.train.seed, "n_train": n_train, "n_test": n_test,
            "reference_auc": ref_auc, "ours_auc": ours_auc,
            "ours_best_auc": round(ours_best, 4),
            "reference_wall_s": round(ref_s, 1), "ours_wall_s": round(ours_s, 1)}


def _aggregate_seeds(rows: list[dict]) -> dict:
    """Collapse per-seed rows into a distribution summary (mean/std/min/max
    for final and best AUC, both sides).  Keys absent from the rows (the
    A/B reference loops expose no per-epoch AUC, so no reference_best_auc)
    are skipped rather than KeyError'd."""

    def stats(key):
        v = np.array([r[key] for r in rows if key in r], dtype=np.float64)
        if v.size == 0:
            return None
        return {"mean": round(float(v.mean()), 4),
                "std": round(float(v.std(ddof=1)) if len(v) > 1 else 0.0, 4),
                "min": round(float(v.min()), 4),
                "max": round(float(v.max()), 4)}

    agg = {"family": rows[0]["family"], "profile": rows[0]["profile"],
           "epochs": rows[0]["epochs"], "n_train": rows[0]["n_train"],
           "seeds": [r["seed"] for r in rows]}
    for key in ("reference_auc", "ours_auc",
                "reference_best_auc", "ours_best_auc"):
        st = stats(key)
        if st is not None:
            agg[key] = st
    agg["per_seed"] = rows
    return agg


def run_multiseed(family: str, epochs: int, n_train: int, out_dir: Path,
                  profile: str, seeds: list[int], runner) -> dict:
    """Run ``runner`` once per seed (init/dropout draw only — same task) and
    aggregate.  Crash-safe: partial per-seed rows land in
    ``results_seeds_{family}.json`` after every seed so a wall-clock kill
    loses at most one seed.  The first seed of each family pays the jit
    compile — its row is flagged ``cold`` and its wall time is NOT a
    steady-state number (same convention as bench.py's contention flag)."""
    rows = []
    for i, s in enumerate(seeds):
        row = runner(epochs, n_train, out_dir, profile=profile, seed=s)
        row["cold"] = (i == 0)
        rows.append(row)
        (out_dir / f"results_seeds_{family}.json").write_text(json.dumps(
            {"rows": rows, "measured_at": time.time(), "profile": profile,
             "partial": i != len(seeds) - 1}, indent=1) + "\n")
        best = (f" (best {row['reference_best_auc']:.3f})"
                if "reference_best_auc" in row else "")
        print(f"  seed {s}: ref {row['reference_auc']:.3f}{best}  ours "
              f"{row['ours_auc']:.3f} (best {row['ours_best_auc']:.3f})"
              f"{'  [cold]' if row['cold'] else ''}",
              flush=True)
    return _aggregate_seeds(rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true",
                    help="small config (CI-sized); full study otherwise")
    ap.add_argument("--profile", default="hard", choices=["easy", "hard"],
                    help="synthetic task difficulty (hard = non-saturating)")
    ap.add_argument("--families", default="c,b,a",
                    help="comma list of families to run (subset of a,b,c)")
    ap.add_argument("--seeds", default="",
                    help="comma list of init seeds; when set, every selected "
                         "family that supports it runs once per seed and the "
                         "study reports the AUC distribution (mean/std) "
                         "instead of a single draw")
    ap.add_argument("--out", default=str(REPO / "runs" / "auc_parity"))
    args = ap.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    fams = [f.strip() for f in args.families.split(",") if f.strip()]

    # epochs sized past the hard task's takeoff point (~epoch 10-12 for C:
    # both implementations' AUC trajectories climb steeply late — a
    # 12-epoch cut measures seed luck, not converged quality)
    sizes = ({"c": (4, 48), "b": (4, 48), "a": (3, 32)} if args.fast
             else {"c": (20, 256), "b": (8, 192), "a": (12, 128)})
    runners = {"c": run_family_c, "b": run_family_b, "a": run_family_a}

    if args.seeds:
        seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
        agg_rows = []
        for fam in fams:
            epochs, n_train = sizes[fam]
            print(f"[multiseed] family {fam}: {len(seeds)} seeds × "
                  f"{epochs} epochs", flush=True)
            agg_rows.append(run_multiseed(fam, epochs, n_train, out_dir,
                                          args.profile, seeds, runners[fam]))
            (out_dir / "results_multiseed.json").write_text(json.dumps(
                {"rows": agg_rows, "measured_at": time.time(),
                 "profile": args.profile,
                 "note": "seed varies ONLY the init/dropout draw; dataset "
                         "and shuffle order fixed; AUC distribution over "
                         "seeds, identical uint8 clips both sides"},
                indent=1))
        print(f"\n{'family':8s} {'ref AUC (mean±std)':>20s} "
              f"{'ours AUC (mean±std)':>20s}")
        for r in agg_rows:
            ra, oa = r["reference_auc"], r["ours_auc"]
            best = (f"(best: ref {r['reference_best_auc']['mean']:.3f} "
                    f"ours {r['ours_best_auc']['mean']:.3f})"
                    if "reference_best_auc" in r
                    else f"(ours best {r['ours_best_auc']['mean']:.3f})")
            print(f"{r['family']:8s} {ra['mean']:10.3f}±{ra['std']:.3f} "
                  f"{oa['mean']:12.3f}±{oa['std']:.3f}   {best}")
        return

    rows = []
    for fam in fams:
        epochs, n_train = sizes[fam]
        rows.append(runners[fam](epochs, n_train, out_dir,
                                 profile=args.profile))
        # crash-safe partial write: a multi-hour CPU study shouldn't lose
        # finished rows to a failure in a later family
        (out_dir / "results.json").write_text(json.dumps(
            {"rows": rows, "measured_at": time.time(),
             "profile": args.profile, "partial": fam != fams[-1]}, indent=1))

    results = {"rows": rows, "measured_at": time.time(),
               "profile": args.profile,
               "note": "identical uint8-quantized synthetic clips both sides; "
                       "AUC on the held-out Test split (anomaly_rate 0.5); "
                       "profile='hard' = motion-coherence-only anomalies "
                       "(appearance stats identical both classes)"}
    (out_dir / "results.json").write_text(json.dumps(results, indent=1))
    print(f"\n{'family':8s} {'ref AUC':>8s} {'ours AUC':>9s} "
          f"{'ref s':>7s} {'ours s':>7s}")
    for r in rows:
        print(f"{r['family']:8s} {r['reference_auc']:8.3f} "
              f"{r['ours_auc']:9.3f} {r['reference_wall_s']:7.1f} "
              f"{r['ours_wall_s']:7.1f}")
    print(f"results -> {out_dir / 'results.json'}")


if __name__ == "__main__":
    main()
