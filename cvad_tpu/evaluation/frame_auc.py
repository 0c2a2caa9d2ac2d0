"""Frame-level ROC-AUC against real ground truth — the north-star metric.

BASELINE.md's north star is "match reference frame-AUC on CUHK Avenue".  The
reference never computes a frame-level AUC (it scores synthetic clip labels
only; SURVEY.md §6 "frame-AUC: not reported anywhere"), so this driver IS the
missing half: per-video sliding-window scoring (`VideoScorer.score_video`'s
aggregated frame curves) against the per-frame annotations
:mod:`cvad_tpu.data.ground_truth` ingests (UCSD ``Test00N_gt`` masks, Avenue
``.mat`` volumes).

Protocol (the standard VAD evaluation):
- score every test video -> per-frame anomaly curve (mean of windows
  covering each frame);
- micro AUC: concatenate all videos' curves and labels, one ROC-AUC;
- also reported: per-video AUCs (where both classes appear) and their macro
  mean, plus a per-video min-max-normalized micro AUC (the common variant —
  papers disagree on which to report, so we report both).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import numpy as np


def frame_level_auc(score_video: Callable[[Sequence[str]], Dict[str, np.ndarray]],
                    videos: Sequence, frame_labels: Dict[str, np.ndarray]
                    ) -> Dict:
    """Compute the frame-AUC report.

    `score_video(frames) -> {"frame_scores": (n,)}` is a
    :class:`~cvad_tpu.evaluation.scoring.VideoScorer` bound method (or any
    compatible callable); `videos` is ``[(name, frame_paths)]`` in scan
    order; `frame_labels` maps video name -> (n_frames,) 0/1 array.
    Videos without ground truth are skipped (counted in the report).
    """
    from sklearn.metrics import roc_auc_score

    curves, labels, per_video = [], [], {}
    skipped = []
    for name, frames in videos:
        gt = frame_labels.get(name)
        if gt is None:
            skipped.append(name)
            continue
        curve = np.asarray(score_video(frames)["frame_scores"], np.float64)
        n = min(len(curve), len(gt))
        curve, gt = curve[:n], np.asarray(gt[:n], np.float64)
        curves.append(curve)
        labels.append(gt)
        per_video[name] = (float(roc_auc_score(gt, curve))
                           if len(np.unique(gt)) == 2 else None)
    if not curves:
        return {"frame_auc": None, "n_videos": 0, "n_frames": 0,
                "skipped_videos": skipped,
                "error": "no ground truth found for any video"}
    y = np.concatenate(labels)
    s = np.concatenate(curves)
    norm = np.concatenate([_minmax(c) for c in curves])
    vid_aucs = [a for a in per_video.values() if a is not None]
    both = len(np.unique(y)) == 2
    return {
        "frame_auc": float(roc_auc_score(y, s)) if both else None,
        "frame_auc_normalized": float(roc_auc_score(y, norm)) if both else None,
        "macro_auc": float(np.mean(vid_aucs)) if vid_aucs else None,
        "per_video_auc": per_video,
        "n_videos": len(curves),
        "n_frames": int(y.size),
        "anomalous_frames": int(y.sum()),
        "skipped_videos": skipped,
    }


def _minmax(c: np.ndarray) -> np.ndarray:
    lo, hi = float(c.min()), float(c.max())
    return (c - lo) / (hi - lo) if hi > lo else np.zeros_like(c)


def dataset_frame_auc(score_fn: Callable, data_cfg, root: str,
                      split: str = "Test", batch_size: int = 64,
                      frame_labels: Optional[Dict[str, np.ndarray]] = None
                      ) -> Dict:
    """Turnkey frame-AUC over a dataset tree: scan `root`/`split`'s video
    folders, load whatever ground truth exists, score every video with
    `score_fn` (a (B,T,H,W,C)->scores callable), aggregate."""
    from pathlib import Path

    from cvad_tpu.data.frames import scan_video_folders
    from cvad_tpu.data.ground_truth import load_gt_frame_labels
    from cvad_tpu.evaluation.scoring import VideoScorer

    rootp = Path(root)
    split_dir = next((rootp / s for s in
                      (split, split.capitalize(), split.lower(),
                       "testing/frames", "testing")
                      if (rootp / s).is_dir()), None)
    if split_dir is None:
        raise FileNotFoundError(f"no {split} split under {root}")
    videos = scan_video_folders(str(split_dir))
    if frame_labels is None:
        frame_labels = load_gt_frame_labels(root, split,
                                            [n for n, _ in videos])
    scorer = VideoScorer(score_fn, data_cfg, batch_size=batch_size)
    return frame_level_auc(scorer.score_video, videos, frame_labels)


def make_trainer_score_fn(trainer) -> Callable:
    """Batch scorer from a (restored) :class:`~cvad_tpu.train.engine.Trainer`
    — works for every family, since each task's `eval_step` returns
    per-clip ``predictions``.  Batches pad up to the mesh's data-axis size
    and shard exactly like `Trainer.evaluate` (padding rows are trimmed)."""
    from cvad_tpu.runtime.mesh import pad_with_valid, shard_batch

    def score(batch: np.ndarray) -> np.ndarray:
        n = len(batch)
        host = {"clips": np.asarray(batch),
                "labels": np.zeros(n, np.float32)}
        padded = pad_with_valid(host, trainer.mesh.shape["data"])
        out = trainer._jit_eval(
            trainer.state,
            shard_batch(trainer.mesh, padded, time_dim=trainer._time_dim))
        return np.asarray(out["predictions"]).reshape(-1)[:n]

    return score
