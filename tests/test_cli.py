"""CLI driver tests (L6 entry points)."""

import json

import numpy as np
import pytest

from cvad_tpu.cli import main


def test_cli_train_synthetic(tmp_path, capsys):
    rc = main(["train", "--preset", "avenue_improved", "--epochs", "1",
               "--out", str(tmp_path), "--n-synthetic", "8",
               "--set", "data.batch_size=4", "--set", "data.frame_size=16,16",
               "--set", "train.log_every=1000000"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["final_loss"]) and out["epochs"] == 1
    assert (tmp_path / "config.json").exists()
    assert (tmp_path / "improved_training_history.json").exists()


def test_cli_bad_override(tmp_path):
    with pytest.raises(AttributeError):
        main(["train", "--out", str(tmp_path), "--set", "optim.nonexistent=1"])


def test_cli_diagnose_and_plots(tmp_path, capsys):
    hist = {"epochs": [1, 2], "train_losses": [1.0, 0.5],
            "loss_components": [{"anomaly_loss": 1.0}] * 2,
            "evaluation_metrics": [{"mean_score": 0.3, "score_range": 0.2}],
            "learning_rates": [1e-3, 1e-3]}
    p = tmp_path / "hist.json"
    p.write_text(json.dumps(hist))
    assert main(["diagnose", str(p)]) == 0
    capsys.readouterr()
    out_png = tmp_path / "dash.png"
    assert main(["plots", str(p), "--out", str(out_png)]) == 0
    assert out_png.stat().st_size > 0


def test_cli_convert(tmp_path, capsys):
    import os

    if not os.path.exists("/root/reference/best_improved_model.pth"):
        pytest.skip("reference checkpoint absent")
    rc = main(["convert", "/root/reference/best_improved_model.pth",
               "--out", str(tmp_path / "ckpt")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["params"] == 188_849
