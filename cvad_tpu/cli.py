"""Command-line drivers (L6), mirroring the reference's entry scripts.

  cvad train      — the five training recipes as presets
                    (avenue_training_script2.py main, minicausal_vad_complete3,
                    causal_anomaly_detection{,1}, video_anomaly_detection)
  cvad eval       — standalone checkpoint evaluation (test_model analog)
  cvad auc        — frame-level ROC-AUC vs real ground truth (UCSD _gt
                    masks / Avenue .mat volumes): the north-star metric
  cvad score      — sliding-window full-video scoring + anomalous-clip
                    extraction (avenue_training_script_bbox.py inference path)
  cvad report     — bbox visualization + JSON/HTML report (AnomalyVisualizer)
  cvad diagnose   — training-history diagnosis (avenue_training_script2:474)
  cvad smoke      — pre-training model/dataset gate (minicausal_vad_complete3:503)
  cvad plots      — history dashboard (avenue_training_script1:228-291)
  cvad convert    — torch .pth <-> framework checkpoint conversion
  cvad export     — AOT serving artifact (jax.export StableHLO + weights)
  cvad serve      — HTTP scoring endpoint over the batching service
  cvad synth      — synthetic dataset tree (exercise the real IO path)
  cvad doctor     — environment diagnosis (device probe with timeout,
                    decode backends, native decoder, reference checkout)

Usage: ``python -m cvad_tpu.cli <command> [...]``.  Every hard-coded constant
of the reference is a ``--set section.key=value`` override here.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

from cvad_tpu.config import DataConfig, ExperimentConfig, preset


def _apply_overrides(cfg: ExperimentConfig, overrides) -> ExperimentConfig:
    for item in overrides or []:
        key, _, raw = item.partition("=")
        section, _, field = key.partition(".")
        sub = getattr(cfg, section)
        cur = getattr(sub, field)  # raises for unknown keys — fail loudly
        value = _coerce(raw, cur)
        cfg = cfg.replace(**{section: sub.replace(**{field: value})})
    return cfg


def _coerce(raw: str, like):
    if isinstance(like, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(like, int) and not isinstance(like, bool):
        return int(raw)
    if isinstance(like, float):
        return float(raw)
    if isinstance(like, tuple):
        parts = [p for p in raw.replace("(", "").replace(")", "").split(",") if p]
        elem = like[0] if like else 0
        return tuple(type(elem)(p) for p in parts)
    return raw


def cmd_train(args) -> int:
    from cvad_tpu.train.engine import Trainer, make_loaders

    cfg = preset(args.preset)
    if args.epochs is not None:
        cfg = cfg.replace(train=cfg.train.replace(num_epochs=args.epochs))
    if args.data_root:
        cfg = cfg.replace(data=cfg.data.replace(
            root=args.data_root,
            dataset=args.dataset or cfg.data.dataset))
    elif args.dataset:
        cfg = cfg.replace(data=cfg.data.replace(dataset=args.dataset))
    if args.out:
        cfg = cfg.replace(train=cfg.train.replace(out_dir=args.out))
    cfg = _apply_overrides(cfg, args.set)

    out = Path(cfg.train.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "config.json").write_text(cfg.to_json())

    trainer = Trainer(cfg)
    train_loader, eval_loader = make_loaders(cfg, n_synthetic=args.n_synthetic)
    if getattr(args, "resume", False):
        # restores params/opt/history/scheduler from the latest checkpoint in
        # out_dir — including a rolling 'mid' (intra-epoch) checkpoint, which
        # resumes the interrupted epoch at the exact batch
        restored = trainer.restore(train_loader.sample_batch())
        print(json.dumps({"resumed_from": restored}))
    if args.profile_dir:
        # profile the first epoch (SURVEY.md §5 tracing: the reference has
        # wall-clock timing only; this captures a full device trace)
        from cvad_tpu.runtime.metrics import profile_trace

        if trainer.state is None:  # --resume already restored real state;
            trainer.init_state(next(iter(train_loader)))  # don't re-randomize
        with profile_trace(args.profile_dir):
            trainer.train_epoch(train_loader, epoch=0, record=False)
    history = trainer.fit(train_loader, eval_loader)
    print(json.dumps({"final_loss": history["train_losses"][-1],
                      "epochs": len(history["epochs"])}))
    return 0


def cmd_eval(args) -> int:
    """Standalone checkpoint evaluation — the reference ``test_model``
    analog (`causal_anomaly_detection.py:796-835`,
    `avenue_training_script2.py:265-297`) as a driver: restore a training
    run's checkpoint ('latest', 'best', 'mid', or an epoch number) and run
    the family's full eval surface over a test loader."""
    from cvad_tpu.train.engine import Trainer, make_loaders
    from cvad_tpu.utils.json_utils import safe_json_save

    cfg = preset(args.preset)
    if args.data_root:
        cfg = cfg.replace(data=cfg.data.replace(
            root=args.data_root, dataset=args.dataset or cfg.data.dataset))
    elif args.dataset:
        cfg = cfg.replace(data=cfg.data.replace(dataset=args.dataset))
    if args.out:
        cfg = cfg.replace(train=cfg.train.replace(out_dir=args.out))
    cfg = _apply_overrides(cfg, args.set)

    from cvad_tpu.data.batcher import BatchLoader
    from cvad_tpu.data.datasets import build_dataset

    trainer = Trainer(cfg)
    # test split only — evaluation never touches the training dataset, so
    # don't pay its scan/synthesis cost (make_loaders builds both)
    eval_loader = BatchLoader(
        build_dataset(cfg.data, "Test", max(args.n_synthetic // 2, 2)),
        cfg.data.batch_size, shuffle=False,
        num_threads=cfg.data.num_decode_threads, prefetch=cfg.data.prefetch,
        transfer_dtype=cfg.data.transfer_dtype)
    step = int(args.step) if str(args.step).isdigit() else args.step
    try:
        restored = trainer.restore(eval_loader.sample_batch(), step=step)
    except FileNotFoundError as e:  # explicit --step ('best'/'mid'/N) not on
        restored = None  # disk: structured error, no traceback.  Other
        detail = str(e)  # restore failures (family/shape mismatch, corrupt
    else:                # checkpoint) propagate — they are NOT 'not found'.
        detail = None
    if restored is None:
        print(json.dumps({"error": "no checkpoint found", "step": str(step),
                          "out_dir": cfg.train.out_dir,
                          **({"detail": detail[-300:]} if detail else {})}))
        return 1
    metrics = trainer.evaluate(eval_loader)
    scalar = {k: float(v) for k, v in metrics.items()
              if isinstance(v, (int, float)) and np.isfinite(v)}
    safe_json_save({**scalar, "checkpoint": str(step), "epoch": restored},
                   Path(cfg.train.out_dir) / "eval_metrics.json",
                   verbose=False)
    print(json.dumps({"checkpoint": str(step), "epoch": restored, **scalar}))
    return 0


def cmd_score(args) -> int:
    from cvad_tpu.evaluation.scoring import VideoScorer, make_family_d_score_fn
    from cvad_tpu.runtime.checkpoint import import_torch_family_d
    from cvad_tpu.utils.json_utils import safe_json_save

    variables = import_torch_family_d(args.checkpoint)
    cfg = DataConfig(clip_len=args.clip_len, stride=args.stride,
                     frame_size=(args.frame_size, args.frame_size), channels=3)
    scorer = VideoScorer(make_family_d_score_fn(variables), cfg)
    clips = scorer.extract_anomalous_clips(args.video_root,
                                           threshold=args.threshold,
                                           max_clips=args.max_clips)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    safe_json_save([dataclasses.asdict(c) | {"causal_graph": None}
                    for c in clips], out / "anomalous_clips.json",
                   verbose=False)
    print(json.dumps({"anomalous_clips": len(clips),
                      "max_score": max((c.score for c in clips), default=0.0)}))
    return 0


def cmd_report(args) -> int:
    from cvad_tpu.evaluation.bbox import AnomalyVisualizer
    from cvad_tpu.evaluation.scoring import VideoScorer, make_family_d_score_fn
    from cvad_tpu.runtime.checkpoint import import_torch_family_d

    variables = import_torch_family_d(args.checkpoint)
    cfg = DataConfig(clip_len=args.clip_len, stride=args.stride,
                     frame_size=(args.frame_size, args.frame_size), channels=3)
    scorer = VideoScorer(make_family_d_score_fn(variables), cfg)
    clips = scorer.extract_anomalous_clips(args.video_root,
                                           threshold=args.threshold,
                                           max_clips=args.max_clips)
    viz = AnomalyVisualizer(scorer, detector_backend=args.detector)
    summary = viz.create_report(clips, args.out)
    print(json.dumps({"clips": summary["total_clips_analyzed"],
                      "report": str(Path(args.out) / "anomaly_detection_report.html")}))
    return 0


def _try_restore(trainer, sample_batch, step):
    try:
        return trainer.restore(sample_batch, step=step)
    except FileNotFoundError:
        return None


def cmd_auc(args) -> int:
    """Frame-level ROC-AUC against real ground truth — the BASELINE.md
    north-star metric, turnkey: the moment a real UCSD Ped2 / Avenue tree
    (with its ``_gt`` masks / ``.mat`` volumes) is on disk, one command
    produces the number.  Scores come either from a torch checkpoint
    (``--torch-checkpoint``, e.g. the reference's shipped
    ``best_improved_model.pth``) or from one of our training runs
    (``--out`` + ``--step``, any family preset)."""
    from cvad_tpu.evaluation.frame_auc import (dataset_frame_auc,
                                               make_trainer_score_fn)
    from cvad_tpu.utils.json_utils import safe_json_save

    cfg = preset(args.preset)
    if args.data_root:
        cfg = cfg.replace(data=cfg.data.replace(root=args.data_root))
    if args.out:
        cfg = cfg.replace(train=cfg.train.replace(out_dir=args.out))
    cfg = _apply_overrides(cfg, args.set)
    dcfg = cfg.data

    if args.torch_checkpoint:
        from cvad_tpu.evaluation.scoring import make_score_fn
        from cvad_tpu.runtime import checkpoint as ckpt

        fam = args.family
        if fam == "b":
            variables, memory = ckpt.import_torch_family_b(
                args.torch_checkpoint)
            score_fn = make_score_fn("b", variables, memory=memory)
        else:
            importer = getattr(ckpt, f"import_torch_family_{fam}")
            score_fn = make_score_fn(fam, importer(args.torch_checkpoint))
    else:
        from cvad_tpu.data.batcher import BatchLoader
        from cvad_tpu.data.datasets import build_dataset
        from cvad_tpu.train.engine import Trainer

        trainer = Trainer(cfg)
        loader = BatchLoader(build_dataset(dcfg, "Test", 8),
                             dcfg.batch_size, shuffle=False)
        step = int(args.step) if str(args.step).isdigit() else args.step
        sample = loader.sample_batch()
        restored = _try_restore(trainer, sample, step)
        if restored is None and step == "best":
            restored = _try_restore(trainer, sample, "latest")
        if restored is None:
            print(json.dumps({"error": "no checkpoint found",
                              "step": str(step),
                              "out_dir": cfg.train.out_dir}))
            return 1
        score_fn = make_trainer_score_fn(trainer)

    report = dataset_frame_auc(score_fn, dcfg, dcfg.root, split=args.split,
                               batch_size=args.batch_size)
    if args.report_out:
        safe_json_save(report, args.report_out, verbose=False)
    print(json.dumps({k: report.get(k) for k in
                      ("frame_auc", "frame_auc_normalized", "macro_auc",
                       "n_videos", "n_frames", "anomalous_frames")}))
    return 0 if report.get("frame_auc") is not None else 1


def cmd_diagnose(args) -> int:
    from cvad_tpu.utils.diagnose import diagnose_training_issues

    result = diagnose_training_issues(history_file=args.history)
    print(json.dumps(result["warnings"]))
    return 0


def cmd_smoke(args) -> int:
    """Pre-training gate (``minicausal_vad_complete3.py:503-561``: the
    reference ran test_simple_model + debug_dataset_dtypes before training)."""
    from cvad_tpu.utils.diagnose import debug_dataset_dtypes, smoke_test_model

    result = smoke_test_model(verbose=False)
    if args.data_root:
        from cvad_tpu.data.datasets import build_dataset

        cfg = DataConfig(dataset=args.dataset, root=args.data_root)
        recs = debug_dataset_dtypes(build_dataset(cfg), verbose=False)
        result["dataset_samples"] = recs
        result["ok"] = result["ok"] and not any(
            r.get("float64") or "error" in r for r in recs)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


def cmd_plots(args) -> int:
    if args.block_correlation:
        return _cmd_block_correlation(args)
    from cvad_tpu.evaluation.plots import visualize_training_results
    from cvad_tpu.utils.json_utils import safe_json_load

    if not args.history:
        print("cvad plots needs a history JSON (or --block-correlation)",
              file=sys.stderr)
        return 1
    history = safe_json_load(args.history)
    if history is None:
        print(f"cannot read history: {args.history}", file=sys.stderr)
        return 1
    path = visualize_training_results(history, args.out)
    print(path or "matplotlib unavailable")
    return 0 if path else 1


def _cmd_block_correlation(args) -> int:
    """Per-block feature-correlation heatmaps for family C — the analysis
    behind the reference's shipped ``Figure 2025-09-04 180626.png``, whose
    producing script is absent from the repo (SURVEY.md §2.4)."""
    import jax

    from cvad_tpu.data.batcher import BatchLoader
    from cvad_tpu.data.datasets import build_dataset
    from cvad_tpu.evaluation.block_correlation import (
        block_channel_correlations, plot_block_correlations)
    from cvad_tpu.train.engine import Trainer

    cfg = preset(args.preset)
    if args.data_root:
        cfg = cfg.replace(data=cfg.data.replace(root=args.data_root))
    if args.run:
        cfg = cfg.replace(train=cfg.train.replace(out_dir=args.run))
    cfg = _apply_overrides(cfg, args.set)
    trainer = Trainer(cfg)
    loader = BatchLoader(build_dataset(cfg.data, "Test", 32),
                         cfg.data.batch_size, shuffle=False)
    sample = loader.sample_batch()
    restored = None
    if args.run:
        # digit strings name epoch checkpoints (step_0000000N dirs) — same
        # conversion as cmd_eval
        step = int(args.step) if str(args.step).isdigit() else args.step
        restored = trainer.restore(sample, step=step)
        if restored is None:
            print(json.dumps({"error": "no checkpoint found",
                              "out_dir": cfg.train.out_dir}))
            return 1
    else:
        trainer.init_state(sample)  # fresh init: structure-only figure
    mats = block_channel_correlations(
        jax.device_get(trainer.state.variables()), sample["clips"],
        model=trainer.task.model)
    path = plot_block_correlations(mats, args.out)
    print(json.dumps({
        "out": path, "restored": restored,
        "blocks": [m.shape[0] for m in mats],
        "mean_abs_offdiag": [round(float(
            (np.abs(m).sum() - m.shape[0]) / (m.size - m.shape[0])), 4)
            for m in mats]}))
    return 0 if path else 1


def cmd_convert(args) -> int:
    import jax

    from cvad_tpu.runtime import checkpoint as ckpt
    from cvad_tpu.runtime.checkpoint import CheckpointManager

    importers = {"a": ckpt.import_torch_family_a,
                 "b": ckpt.import_torch_family_b,
                 "c": ckpt.import_torch_family_c,
                 "d": ckpt.import_torch_family_d,
                 "e": ckpt.import_torch_family_e}
    variables = importers[args.family](args.torch_checkpoint)
    mgr = CheckpointManager(args.out)
    mgr.save("imported", variables, wait=True)
    n = sum(int(np.asarray(p).size)
            for p in jax.tree_util.tree_leaves(variables))
    print(json.dumps({"params": n, "out": str(Path(args.out) / "imported")}))
    return 0


def cmd_export(args) -> int:
    """Produce a self-contained serving artifact from a torch checkpoint:
    one binary blob (StableHLO + weights, batch-polymorphic) that
    ``load_scorer``/``ClipScoringService.from_exported`` runs with no model
    code — the deployment story the reference lacks (it ships the .pth plus
    the model class, ``avenue_training_script_bbox.py:104-155``)."""
    from cvad_tpu.evaluation import serving
    from cvad_tpu.runtime import checkpoint as ckpt

    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    if args.family == "a":
        variables = ckpt.import_torch_family_a(args.torch_checkpoint)
        blob = serving.export_family_a_scorer(variables, platforms=platforms)
    elif args.family == "b":
        variables, memory = ckpt.import_torch_family_b(args.torch_checkpoint)
        blob = serving.export_family_b_scorer(variables, memory,
                                              platforms=platforms)
    elif args.family == "c":
        variables = ckpt.import_torch_family_c(args.torch_checkpoint)
        blob = serving.export_family_c_scorer(variables, platforms=platforms)
    elif args.family == "e":
        variables = ckpt.import_torch_family_e(args.torch_checkpoint)
        blob = serving.export_family_e_scorer(variables, platforms=platforms)
    else:
        variables = ckpt.import_torch_family_d(args.torch_checkpoint)
        blob = serving.export_scorer(variables, platforms=platforms)
    Path(args.out).write_bytes(blob)
    print(json.dumps({"out": args.out, "bytes": len(blob)}))
    return 0


def cmd_serve(args) -> int:
    """Run the HTTP scoring endpoint (``evaluation/http_service.py``):
    bucket-padded batched inference with dynamic request coalescing, over
    either a torch checkpoint or an AOT ``cvad export`` blob.  The
    reference's only inference path is an in-process per-clip loop
    (``avenue_training_script_bbox.py:328-357``)."""
    from cvad_tpu.evaluation.http_service import (ScoringHTTPServer,
                                                  service_from_path)

    if args.probe_timeout > 0:
        # fail fast with a structured error instead of hanging at first
        # model compile when the accelerator relay is wedged
        from cvad_tpu.runtime.doctor import probe_devices

        status, detail = probe_devices(args.probe_timeout)
        if status != "ok":
            print(json.dumps({"error": "accelerator unreachable",
                              "device_probe": status, "detail": detail}))
            return 1
    svc = service_from_path(
        args.model, family=args.family,
        buckets=tuple(int(b) for b in args.buckets.split(",")))
    srv = ScoringHTTPServer(svc, host=args.host, port=args.port,
                            max_wait_ms=args.max_wait_ms)
    # an explicit --warmup-dtypes implies --warmup: passing it without the
    # flag used to be silently ignored (the first request still hit the
    # cold compile), which is never what the caller meant
    if args.warmup or args.warmup_dtypes != "float32":
        svc.warmup(dtypes=tuple(d.strip() for d in
                                args.warmup_dtypes.split(",") if d.strip()))
    print(json.dumps({"host": srv.host, "port": srv.port,
                      "buckets": list(svc.buckets)}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.close()
    return 0


def cmd_doctor(args) -> int:
    """Environment diagnosis: accelerator reachability (probed in a
    subprocess with a hard timeout — a wedged PJRT relay hangs any
    in-process backend discovery), decode backends, native decoder, and
    reference-checkout presence.  One JSON object on stdout."""
    import os

    info: dict = {}
    from cvad_tpu.data.native_decoder import load_library, supported_suffixes

    info["native_decoder"] = load_library() is not None
    info["native_formats"] = sorted(supported_suffixes() or ())
    for mod in ("PIL", "cv2", "torch"):
        try:
            __import__(mod)
            info[f"has_{mod.lower()}"] = True
        except Exception:
            info[f"has_{mod.lower()}"] = False
    info["reference_present"] = os.path.isdir("/root/reference")
    info["cvad_platform"] = os.environ.get("CVAD_PLATFORM")
    from cvad_tpu.runtime.doctor import probe_devices

    status, detail = probe_devices(args.probe_timeout)
    info["device_probe"] = status
    if status == "ok":
        info["devices"] = detail
    else:
        info["device_probe_detail"] = detail
    print(json.dumps(info))
    return 0 if status == "ok" else 1


def cmd_synth(args) -> int:
    """Write a synthetic UCSD-style frame-folder tree (Train/Test splits,
    per-video frame folders) so the real disk -> decode -> train path can be
    exercised without downloading a dataset.  Formats cover the real
    datasets' encodings (UCSD .tif, Avenue jpg/png) plus the native-decoder
    formats (pgm/ppm)."""
    from cvad_tpu.data.synthetic import write_synthetic_video_tree

    root = write_synthetic_video_tree(
        args.out, videos_per_split=args.videos,
        frames_per_video=args.frames,
        hw=tuple(int(x) for x in args.hw.split(",")),
        channels=args.channels, fmt=args.format, seed=args.seed,
        write_gt=args.write_gt)
    n = sum(1 for _ in Path(root).rglob("*") if _.is_file())
    print(json.dumps({"root": root, "files": n, "format": args.format}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cvad", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a model family preset")
    t.add_argument("--preset", default="avenue_improved",
                   help="avenue_improved|mini3d|memory_ae|causal_pipeline")
    t.add_argument("--dataset", default=None,
                   help="synthetic|avenue|ucsd_ped2")
    t.add_argument("--data-root", default=None)
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--out", default=None)
    t.add_argument("--n-synthetic", type=int, default=256)
    t.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the first epoch")
    t.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in out_dir "
                        "(supports intra-epoch 'mid' checkpoints)")
    t.add_argument("--set", action="append", metavar="SEC.KEY=VAL",
                   help="config override, e.g. --set optim.lr=1e-4")
    t.set_defaults(fn=cmd_train)

    ev = sub.add_parser("eval", help="evaluate a training run's checkpoint "
                                     "(reference test_model analog)")
    ev.add_argument("--preset", default="avenue_improved")
    ev.add_argument("--dataset", default=None)
    ev.add_argument("--data-root", default=None)
    ev.add_argument("--out", default=None,
                    help="training out_dir holding the checkpoints")
    ev.add_argument("--step", default="latest",
                    help="latest|best|mid|<epoch number>")
    ev.add_argument("--n-synthetic", type=int, default=64)
    ev.add_argument("--set", action="append", metavar="SEC.KEY=VAL")
    ev.set_defaults(fn=cmd_eval)

    for name, fn in (("score", cmd_score), ("report", cmd_report)):
        s = sub.add_parser(name)
        s.add_argument("video_root")
        s.add_argument("--checkpoint",
                       default="/root/reference/best_improved_model.pth")
        s.add_argument("--threshold", type=float, default=0.3)
        s.add_argument("--clip-len", type=int, default=8)
        s.add_argument("--stride", type=int, default=4)
        s.add_argument("--frame-size", type=int, default=64)
        s.add_argument("--max-clips", type=int, default=10)
        s.add_argument("--out", default="anomaly_output")
        if name == "report":
            s.add_argument("--detector", default="auto")
        s.set_defaults(fn=fn)

    au = sub.add_parser("auc", help="frame-level ROC-AUC vs real ground "
                                    "truth (the north-star metric)")
    au.add_argument("--preset", default="avenue_improved")
    au.add_argument("--data-root", required=True,
                    help="dataset root holding the split + ground truth")
    au.add_argument("--split", default="Test")
    au.add_argument("--torch-checkpoint", default=None,
                    help="score from a torch .pth (reference checkpoint)")
    au.add_argument("--family", default="d", choices=list("abcde"),
                    help="model family of --torch-checkpoint")
    au.add_argument("--out", default=None,
                    help="training out_dir holding our checkpoints")
    au.add_argument("--step", default="best",
                    help="best|latest|mid|<epoch> (with --out); 'best' "
                         "falls back to 'latest' if no best was saved")
    au.add_argument("--batch-size", type=int, default=64)
    au.add_argument("--report-out", default=None,
                    help="write the full per-video report JSON here")
    au.add_argument("--set", action="append", metavar="SEC.KEY=VAL")
    au.set_defaults(fn=cmd_auc)

    d = sub.add_parser("diagnose")
    d.add_argument("history")
    d.set_defaults(fn=cmd_diagnose)

    sm = sub.add_parser("smoke", help="pre-training model + dataset gate")
    sm.add_argument("--data-root", default=None)
    sm.add_argument("--dataset", default="ucsd_ped2")
    sm.set_defaults(fn=cmd_smoke)

    pl = sub.add_parser("plots")
    pl.add_argument("history", nargs="?", default=None)
    pl.add_argument("--out", default="training_results.png")
    pl.add_argument("--block-correlation", action="store_true",
                    dest="block_correlation",
                    help="per-conv-block channel-correlation heatmaps "
                         "(the reference's Figure 2025-09-04 analysis)")
    pl.add_argument("--run", default=None,
                    help="training run dir whose checkpoint to analyze "
                         "(omit for a fresh-init structure figure)")
    pl.add_argument("--step", default="latest",
                    help="checkpoint to restore: latest|best|mid|epoch N")
    pl.add_argument("--preset", default="family_c")
    pl.add_argument("--data-root", default=None, dest="data_root")
    pl.add_argument("--set", action="append", default=[],
                    help="config override key=value (repeatable)")
    pl.set_defaults(fn=cmd_plots)

    c = sub.add_parser("convert")
    c.add_argument("torch_checkpoint")
    c.add_argument("--out", default="converted_ckpt")
    c.add_argument("--family", default="d", choices=("a", "b", "c", "d", "e"),
                   help="which reference architecture the .pth belongs to")
    c.set_defaults(fn=cmd_convert)

    x = sub.add_parser("export")
    x.add_argument("torch_checkpoint")
    x.add_argument("--family", default="d", choices=("a", "b", "c", "d", "e"),
                   help="which reference architecture the .pth belongs to")
    x.add_argument("--out", default="scorer.jaxexport")
    x.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. tpu,cpu")
    x.set_defaults(fn=cmd_export)

    sv = sub.add_parser("serve", help="HTTP scoring endpoint")
    sv.add_argument("model", help=".pth checkpoint or .jaxexport blob")
    sv.add_argument("--family", default="d", choices=("a", "b", "c", "d", "e"))
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8700,
                    help="0 binds an ephemeral port (printed at startup)")
    sv.add_argument("--buckets", default="1,8,32,128")
    sv.add_argument("--max-wait-ms", type=float, default=2.0,
                    dest="max_wait_ms")
    sv.add_argument("--warmup", action="store_true",
                    help="compile every bucket before accepting traffic")
    sv.add_argument("--warmup-dtypes", default="float32",
                    dest="warmup_dtypes",
                    help="comma list of client payload dtypes to pre-compile "
                         "(e.g. float32,uint8 — uint8 = raw pixels, 4x "
                         "smaller wire + host->device transfer)")
    sv.add_argument("--probe-timeout", type=float, default=120.0,
                    help="device reachability check before loading the "
                         "model (0 disables)")
    sv.set_defaults(fn=cmd_serve)

    dr = sub.add_parser("doctor", help="environment diagnosis (device "
                                       "probe, decode backends, reference)")
    dr.add_argument("--probe-timeout", type=float, default=60.0)
    dr.set_defaults(fn=cmd_doctor)

    sy = sub.add_parser("synth", help="write a synthetic dataset tree")
    sy.add_argument("--out", default="synthetic_ucsd")
    sy.add_argument("--format", default="pgm",
                    choices=("pgm", "ppm", "npy", "tif", "tif_lzw", "jpg",
                             "png"))
    sy.add_argument("--videos", type=int, default=2)
    sy.add_argument("--frames", type=int, default=24)
    sy.add_argument("--hw", default="64,64")
    sy.add_argument("--channels", type=int, default=1)
    sy.add_argument("--seed", type=int, default=0)
    sy.add_argument("--write-gt", action="store_true",
                    help="emit UCSD-style <video>_gt mask folders with "
                         "frame-level anomaly segments")
    sy.set_defaults(fn=cmd_synth)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
