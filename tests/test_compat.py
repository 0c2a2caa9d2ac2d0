"""Reference-API compatibility layer: the reconstructed missing-module
interfaces behave exactly as the reference call sites expect."""

import numpy as np
import pytest

from cvad_tpu.compat import (ImprovedMiniCausalVAD, MiniCausalVAD,
                             create_unsupervised_labels,
                             setup_training_environment,
                             train_improved_minicausal_vad)
from cvad_tpu.compat import test_trained_model as eval_trained_model


def _loader(n_batches=2, b=4, torch_layout=True):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n_batches):
        clips = rng.uniform(0, 1, (b, 3, 8, 16, 16)).astype(np.float32)
        if not torch_layout:
            clips = np.transpose(clips, (0, 2, 3, 4, 1))
        out.append((clips, np.zeros(b, np.float32)))
    return out


def test_minicausal_vad_interface(tmp_path):
    model = MiniCausalVAD(device="cpu")
    loader = _loader()
    loss, comps = model.train_epoch(loader)
    assert np.isfinite(loss)
    assert {"anomaly_loss", "acyclicity_loss", "sparsity_loss",
            "consistency_loss"} <= set(comps)
    predictions, _, causal_graphs = model.evaluate(loader)
    assert predictions.shape == (8,)
    assert causal_graphs.shape == (8, 16, 16)
    # .model.parameters() numel sums like torch (reference :109)
    n = sum(p.numel() for p in model.model.parameters())
    assert n == 188_849
    # lr override via param_groups (reference :104-106)
    for pg in model.optimizer.param_groups:
        pg["lr"] = 1e-4
    assert abs(model.optimizer.param_groups[0]["lr"] - 1e-4) < 1e-9
    # save/load round trip in torch format
    p = tmp_path / "m.pth"
    model.save_model(str(p))
    model2 = MiniCausalVAD(device="cpu")
    model2.load_model(str(p))
    pred2, _, _ = model2.evaluate(loader)
    np.testing.assert_allclose(pred2, predictions, atol=1e-5)


def test_improved_interface():
    model = ImprovedMiniCausalVAD(device="cpu")
    loader = _loader(torch_layout=False)
    loss, comps = model.train_epoch_improved(loader)
    assert np.isfinite(loss)
    preds, graphs, metrics = model.evaluate_improved(loader)
    assert set(metrics) == {"mean_score", "std_score", "min_score",
                            "max_score", "score_range", "avg_edges",
                            "avg_sparsity", "unique_graphs"}
    # compute_improved_loss callable directly (reference internal API)
    total, c = model.compute_improved_loss(preds, graphs,
                                           np.zeros(len(preds)))
    assert np.isfinite(total) and "edge_count" in c


def test_create_unsupervised_labels():
    model = MiniCausalVAD(device="cpu")
    loader = _loader(n_batches=3)
    scores, pseudo, threshold = create_unsupervised_labels(loader, model, 95)
    assert scores.shape == (12,)
    assert set(np.unique(pseudo)) <= {0.0, 1.0}
    # ~5% above the 95th percentile
    assert pseudo.sum() <= max(1, int(0.1 * len(pseudo)) + 1)


def test_improved_driver(tmp_path):
    loaders = (_loader(2, 4), _loader(1, 4))
    model, history = train_improved_minicausal_vad(
        "unused", num_epochs=2, save_interval=1,
        output_dir=str(tmp_path), loaders=loaders)
    assert history["epochs"] == [1, 2]
    assert len(history["evaluation_metrics"]) >= 1
    assert (tmp_path / "improved_training_history.json").exists()
    assert (tmp_path / "checkpoint_epoch_0.pth").exists()


def test_setup_environment_and_test_trained_model(tmp_path, capsys):
    """Driver-tail parity (avenue_training_script1.py:23-35, :293-313):
    device probe + checkpoint-load-and-evaluate round trip."""
    dev = setup_training_environment()
    assert hasattr(dev, "platform")

    model = MiniCausalVAD(device="cpu")
    loader = _loader()
    model.train_epoch(loader)
    p = tmp_path / "best_model.pth"
    model.save_model(str(p))
    ref_pred, _, ref_graphs = model.evaluate(loader)

    predictions, causal_graphs = eval_trained_model(
        str(p), "unused", loaders=(loader, loader))
    np.testing.assert_allclose(predictions, ref_pred, atol=1e-5)
    assert causal_graphs.shape == ref_graphs.shape
    out = capsys.readouterr().out
    assert "avg causal edges" in out
