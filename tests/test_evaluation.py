"""Evaluation-stack tests: metrics contracts, frame-score aggregation,
sliding-window scorer, bbox report artifacts, plots, diagnosis."""

import json

import numpy as np
import pytest

from cvad_tpu.config import DataConfig
from cvad_tpu.data.synthetic import write_synthetic_video_tree
from cvad_tpu.evaluation.bbox import (AnomalyVisualizer, annotate_frame,
                                      score_tier)
from cvad_tpu.evaluation.detectors import Detection, detect_persons_motion
from cvad_tpu.evaluation.metrics import (binary_metrics,
                                         family_d_eval_metrics,
                                         percentile_threshold,
                                         score_separation)
from cvad_tpu.evaluation.scoring import (ScoredClip, VideoScorer,
                                         aggregate_frame_scores)
from cvad_tpu.utils.diagnose import diagnose_training_issues


def test_family_d_eval_metrics_contract():
    rng = np.random.default_rng(0)
    preds = rng.uniform(0, 1, 20)
    graphs = rng.uniform(0, 1, (20, 16, 16))
    m = family_d_eval_metrics(preds, graphs)
    assert set(m) == {"mean_score", "std_score", "min_score", "max_score",
                      "score_range", "avg_edges", "avg_sparsity",
                      "unique_graphs"}
    assert abs(m["score_range"] - (preds.max() - preds.min())) < 1e-6
    assert m["unique_graphs"] == 20
    assert abs(m["avg_sparsity"] - m["avg_edges"] / 256) < 1e-9


def test_percentile_threshold_uses_normal_only():
    scores = np.array([0.1, 0.2, 0.3, 0.9, 0.95])
    labels = np.array([0, 0, 0, 1, 1])
    thr = percentile_threshold(scores, labels, 95.0)
    assert thr < 0.4  # 95th pct of normal scores, not of all scores


def test_binary_metrics_single_class_nan_auc():
    m = binary_metrics(np.array([0.2, 0.8]), np.array([0, 0]))
    assert np.isnan(m["auc"])
    assert 0 <= m["accuracy"] <= 1


def test_score_separation():
    s = score_separation(np.array([0.1, 0.2, 0.8, 0.9]),
                         np.array([0, 0, 1, 1]))
    assert s["separation"] == pytest.approx(0.7)


def test_aggregate_frame_scores():
    starts = np.array([0, 2])
    scores = np.array([1.0, 0.0])
    curve = aggregate_frame_scores(starts, scores, clip_len=4, n_frames=6)
    np.testing.assert_allclose(curve, [1, 1, 0.5, 0.5, 0, 0])


@pytest.fixture(scope="module")
def scored_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("viz")
    write_synthetic_video_tree(str(root), splits=("testing",),
                               videos_per_split=2, frames_per_video=20,
                               hw=(32, 32), channels=1, fmt="ppm")
    cfg = DataConfig(clip_len=8, stride=4, frame_size=(32, 32), channels=3)

    def fake_score(batch):
        # deterministic pseudo-model: motion energy + fake 4x4 graphs
        s = batch.std(axis=(1, 2, 3, 4)) * 3
        graphs = np.tile(np.eye(4)[None] * 0.6, (len(batch), 1, 1))
        return np.clip(s, 0, 1), graphs

    scorer = VideoScorer(fake_score, cfg)
    return root, scorer


def test_video_scorer(scored_setup):
    root, scorer = scored_setup
    from cvad_tpu.data.frames import scan_video_folders

    videos = scan_video_folders(str(root / "testing"))
    res = scorer.score_video(videos[0][1])
    assert res["scores"].shape == res["starts"].shape == (4,)  # (20-8)/4+1
    assert res["frame_scores"].shape == (20,)
    assert res["graphs"].shape == (4, 4, 4)
    assert np.isfinite(res["frame_scores"]).all()


def test_extract_anomalous_clips_sorted(scored_setup):
    root, scorer = scored_setup
    clips = scorer.extract_anomalous_clips(str(root / "testing"), threshold=0.0)
    assert len(clips) == 8
    scores = [c.score for c in clips]
    assert scores == sorted(scores, reverse=True)
    assert all(c.causal_graph is not None for c in clips)


def test_report_artifacts(scored_setup, tmp_path):
    root, scorer = scored_setup
    clips = scorer.extract_anomalous_clips(str(root / "testing"),
                                           threshold=0.0, max_clips=2)
    viz = AnomalyVisualizer(scorer)
    summary = viz.create_report(clips, str(tmp_path))
    assert summary["total_clips_analyzed"] == 2
    assert (tmp_path / "anomaly_detection_report.json").exists()
    html = (tmp_path / "anomaly_detection_report.html").read_text()
    assert "Anomaly Detection Report" in html
    for i in (1, 2):
        d = tmp_path / f"clip_{i:03d}"
        assert any(d.glob("*_info.json"))
        assert any(d.glob("*_grid.png"))
        assert any(d.glob("*_causal_graph.png"))
    with open(next((tmp_path / "clip_001").glob("*_info.json"))) as f:
        info = json.load(f)
    assert {"clip_id", "anomaly_score", "video_id",
            "frame_range"} <= set(info)


def test_score_tiers():
    assert score_tier(0.5) == "anomaly"
    assert score_tier(0.35) == "suspicious"
    assert score_tier(0.1) == "normal"


def test_annotate_frame_draws_box():
    frame = np.zeros((40, 40, 3), np.uint8)
    det = Detection([5, 5, 20, 30], 0.8)
    out = annotate_frame(frame, [det], clip_score=0.5)
    assert out.sum() > 0  # red box drawn
    assert out.shape == frame.shape


def test_motion_detector_finds_blob():
    frame = np.zeros((80, 80, 3), np.uint8)
    frame[20:60, 30:45] = 255  # person-shaped bright region (h/w ≈ 2.7)
    dets = detect_persons_motion(frame)
    assert len(dets) >= 1
    assert all(len(d.bbox) == 4 for d in dets)


def test_plots_smoke(tmp_path):
    from cvad_tpu.evaluation.plots import (create_additional_analysis,
                                           visualize_results,
                                           visualize_training_results)

    rng = np.random.default_rng(0)
    scores = rng.uniform(0, 1, 40)
    labels = (rng.uniform(size=40) > 0.5).astype(float)
    p1 = visualize_results(scores, labels, rng.normal(size=(40, 6)),
                           tmp_path / "res.png")
    assert p1 and (tmp_path / "res.png").stat().st_size > 0
    p2 = create_additional_analysis(
        {"predictions": scores, "labels": labels,
         "causal_graphs": rng.uniform(0, 1, (40, 6, 6)),
         "factors": rng.normal(size=(40, 6)),
         "kl_losses": rng.uniform(0, 1, 40)},
        tmp_path / "extra.png")
    assert p2 and (tmp_path / "extra.png").stat().st_size > 0
    history = {"epochs": [1, 2], "train_losses": [1.0, 0.5],
               "loss_components": [{"anomaly_loss": 0.5, "sparsity_loss": 0.1}] * 2,
               "evaluation_metrics": [{"mean_score": 0.2, "score_range": 0.1,
                                       "avg_sparsity": 0.3}],
               "learning_rates": [1e-3, 1e-3]}
    p3 = visualize_training_results(history, tmp_path / "hist.png")
    assert p3 and (tmp_path / "hist.png").stat().st_size > 0


def test_bbox_overlay_plot(tmp_path):
    from cvad_tpu.evaluation.plots import visualize_bounding_boxes

    frames = np.random.default_rng(0).uniform(0, 1, (4, 48, 64, 1))
    boxes = np.tile(np.array([32.0, 24.0, 10.0, 20.0]), (4, 5, 1))
    mask = np.ones((4, 5), bool)
    p = visualize_bounding_boxes(frames, boxes, mask, tmp_path / "bb.png")
    assert p and (tmp_path / "bb.png").stat().st_size > 0


def test_diagnose():
    hist = {"train_losses": [1.0] * 6 + [0.99] * 6,
            "loss_components": [{"sparsity_loss": 10.0, "anomaly_loss": 0.1}],
            "evaluation_metrics": [{"score_range": 1e-6, "mean_score": 0.0}] * 3}
    out = diagnose_training_issues(hist, verbose=False)
    assert any("loss reduction" in w for w in out["warnings"])
    assert any("sparsity" in w for w in out["warnings"])
    assert any("collapsed" in w for w in out["warnings"])
    good = {"train_losses": list(np.linspace(1, 0.1, 20)),
            "loss_components": [{"anomaly_loss": 0.5, "sparsity_loss": 0.01}],
            "evaluation_metrics": [{"score_range": 0.5, "mean_score": 0.4}]}
    assert diagnose_training_issues(good, verbose=False)["warnings"] == []


def test_detector_ladder_falls_to_motion():
    from cvad_tpu.evaluation.detectors import setup_detector

    fn, name = setup_detector("auto")
    assert name == "motion"  # offline: yolov5/dnn unavailable
    frame = np.zeros((60, 60, 3), np.uint8)
    frame[10:50, 25:38] = 200
    assert isinstance(fn(frame), list)


def test_detector_explicit_backend_errors():
    from cvad_tpu.evaluation.detectors import setup_detector

    with pytest.raises(RuntimeError):
        setup_detector("opencv")  # no local weights supplied


def test_debug_dataset_dtypes_and_smoke():
    """The reference's inline pre-training gates
    (minicausal_vad_complete3.py:435-501) as structured utilities."""
    from cvad_tpu.config import DataConfig
    from cvad_tpu.data.datasets import SyntheticClipDataset
    from cvad_tpu.utils.diagnose import debug_dataset_dtypes, smoke_test_model

    ds = SyntheticClipDataset(DataConfig(clip_len=8, frame_size=(16, 16)), n=4)
    recs = debug_dataset_dtypes(ds, num_samples=2, verbose=False)
    assert len(recs) == 2
    assert recs[0]["dtype"] == "float32" and not recs[0]["float64"]

    result = smoke_test_model(verbose=False)
    assert result["ok"]
    assert result["param_dtype_issues"] == []
    assert result["output_shape"] == (2, 1)
